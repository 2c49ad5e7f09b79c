"""Lineage checkpoint: resumability + idempotence of the bucket loop."""

import os

import pytest
from pyspark.sql import functions as F

from pyshp_spark.fixtures.images import images_fixture
from pyshp_spark.functions.cells import GRID
from pyshp_spark.plans.lineage import LineageCheckpoint, run_with_lineage


@pytest.fixture()
def pts(spark):
    pdf = images_fixture(n=200, seed=9)[["image_id", "lon", "lat"]]
    df = spark.createDataFrame(pdf)
    return df.withColumn("cell", GRID.cell_expr(F.col("lon"), F.col("lat")))


def job(df):
    return df.groupBy("cell").agg(F.count("*").alias("n"))


class TestLineage:
    def test_full_run_covers_all_points(self, spark, pts, tmp_path):
        out = run_with_lineage(spark, pts, job, str(tmp_path), num_buckets=4)
        assert out.agg(F.sum("n")).collect()[0][0] == 200
        ckpt = LineageCheckpoint(str(tmp_path))
        assert ckpt.completed_buckets() == {0, 1, 2, 3}
        lin = ckpt.lineage(spark)
        rows = {r.bucket: r for r in lin.collect()}
        assert sum(r.rows_in for r in rows.values()) == 200
        assert all(r.checksum is not None for r in rows.values())

    def test_resume_skips_completed(self, spark, pts, tmp_path):
        # simulate a crash: run only buckets 0-1 by pre-committing 2-3
        ckpt = LineageCheckpoint(str(tmp_path))
        calls = []

        def counting_job(df):
            calls.append(1)
            return job(df)

        run_with_lineage(spark, pts, counting_job, str(tmp_path), num_buckets=4)
        first = len(calls)
        assert first == 4
        # re-run: nothing left to do
        out = run_with_lineage(spark, pts, counting_job, str(tmp_path), num_buckets=4)
        assert len(calls) == first  # no bucket re-ran
        assert out.agg(F.sum("n")).collect()[0][0] == 200

    def test_partial_crash_resume(self, spark, pts, tmp_path):
        ckpt = LineageCheckpoint(str(tmp_path))
        # run everything, then delete two lineage rows (simulated lost commits)
        run_with_lineage(spark, pts, job, str(tmp_path), num_buckets=4)
        for b in (1, 3):
            os.remove(os.path.join(ckpt.lineage_dir, f"bucket-{b}.parquet"))
        assert ckpt.completed_buckets() == {0, 2}
        out = run_with_lineage(spark, pts, job, str(tmp_path), num_buckets=4)
        assert ckpt.completed_buckets() == {0, 1, 2, 3}
        assert out.agg(F.sum("n")).collect()[0][0] == 200


class TestCellBucketedLayout:
    """Bucketed-by-cell persistent layout: the cell equi-join between
    two co-bucketed tables must run with ZERO shuffle exchanges."""

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        import pandas as pd  # noqa: PLC0415
        import numpy as np  # noqa: PLC0415

        from pyshp_spark.functions.cells import Grid  # noqa: PLC0415
        from pyshp_spark.plans.layout import (  # noqa: PLC0415
            cell_bucketed_join,
            explain_has_exchange,
            save_cell_bucketed,
            with_cell,
        )

        grid = Grid(x0=0.0, y0=0.0, dx=10.0, dy=10.0, width=1 << 10)
        rng = np.random.default_rng(3)
        pts = spark.createDataFrame(
            pd.DataFrame(
                {
                    "pid": range(500),
                    "x": rng.uniform(0, 100, 500),
                    "y": rng.uniform(0, 100, 500),
                }
            )
        )
        cov = spark.createDataFrame(
            pd.DataFrame(
                {
                    "oid": range(200),
                    "cx": rng.uniform(0, 100, 200),
                    "cy": rng.uniform(0, 100, 200),
                }
            )
        )
        save_cell_bucketed(with_cell(pts, grid), "pts_b", num_buckets=8)
        save_cell_bucketed(
            with_cell(cov, grid, x="cx", y="cy"), "cov_b", num_buckets=8
        )
        try:
            joined = cell_bucketed_join(spark, "pts_b", "cov_b")
            # co-bucketed sort-merge: no shuffle anywhere in the plan
            assert not explain_has_exchange(joined)
            got = {(r.pid, r.oid) for r in joined.collect()}
            # value oracle: plain (shuffling) join on the same key
            want_df = with_cell(pts, grid).join(
                with_cell(cov, grid, x="cx", y="cy"), on="cell"
            )
            want = {(r.pid, r.oid) for r in want_df.collect()}
            assert got == want and len(got) > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS pts_b")
            spark.sql("DROP TABLE IF EXISTS cov_b")
