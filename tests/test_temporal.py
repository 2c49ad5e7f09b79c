"""Temporal operators: sessionize, as-of join, bucketed interval join.

Hand-computable cases pin the boundary semantics (gap strictly greater,
asof <= with right-wins-at-equal-ts, end-exclusive intervals); a
randomized case pins interval_join against a brute-force cross join.
"""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyshp_spark.operators.temporal import asof_join, interval_join, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def events(spark):
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "user_id": [1, 1, 1, 1, 2, 2],
            # user 1: gaps 10s, 3600s (== gap: SAME session), 3601s (new)
            "ts": [_ts(0), _ts(10), _ts(3610), _ts(7211), _ts(0), _ts(5000)],
        }
    )
    return spark.createDataFrame(pdf)


class TestSessionize:
    def test_gap_boundary_is_strict(self, spark, events):
        out = sessionize(events, gap_s=3600.0).toPandas().set_index("event_id")
        assert out.loc[0, "session_idx"] == 1
        assert out.loc[1, "session_idx"] == 1
        # exactly-equal gap does NOT split (strictly-greater test)
        assert out.loc[2, "session_idx"] == 1
        assert out.loc[3, "session_idx"] == 2
        assert out.loc[4, "session_idx"] == 1
        assert out.loc[5, "session_idx"] == 2

    def test_partition_invariance(self, spark, events):
        a = sessionize(events).toPandas().sort_values("event_id")
        b = sessionize(events.repartition(7)).toPandas().sort_values("event_id")
        assert (
            a.session_idx.to_numpy() == b.session_idx.to_numpy()
        ).all()


class TestAsofJoin:
    def test_semantics_and_ties(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame(
                {
                    "event_id": [10, 11, 12],
                    "user_id": [1, 1, 2],
                    # 11 lands EXACTLY on an error ts (right must win);
                    # 12 precedes every error of user 2 (null match)
                    "ts": [_ts(50), _ts(100), _ts(5)],
                }
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {
                    # user 1 has TWO errors at ts=100: greatest event_id wins
                    "event_id": [900, 901, 902, 903],
                    "user_id": [1, 1, 1, 2],
                    "ts": [_ts(20), _ts(100), _ts(100), _ts(10)],
                }
            )
        )
        out = (
            asof_join(
                left, right, key="user_id", ts="ts",
                payload=["event_id"], tiebreak="event_id",
            )
            .toPandas()
            .set_index("event_id")["asof_event_id"]
        )
        assert out.loc[10] == 900
        assert out.loc[11] == 902  # max event_id among the equal-ts errors
        assert pd.isna(out.loc[12])

    def test_single_exchange_plan(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame({"event_id": [1], "user_id": [1], "ts": [_ts(0)]})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"event_id": [2], "user_id": [1], "ts": [_ts(0)]})
        )
        out = asof_join(
            left, right, key="user_id", ts="ts",
            payload=["event_id"], tiebreak="event_id",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1
        assert "Join" not in plan  # the whole point: no join operator


class TestIntervalJoin:
    def test_matches_brute_force(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        pts = pd.DataFrame(
            {
                "event_id": range(300),
                "ts": [_ts(float(s)) for s in rng.integers(0, 50_000, 300)],
            }
        )
        starts = rng.integers(0, 49_000, 40)
        ivs = pd.DataFrame(
            {
                "incident_id": range(40),
                "start_us": starts * 1_000_000,
                "end_us": (starts + rng.integers(1, 2000, 40)) * 1_000_000,
            }
        )
        pdf = pts.assign(us=[int(t.timestamp() * 1e6) for t in pts.ts])
        brute = {
            (int(p.event_id), int(i.incident_id))
            for _, p in pdf.iterrows()
            for _, i in ivs.iterrows()
            if i.start_us <= p.us < i.end_us
        }
        got = interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(ivs),
            bucket_s=600.0,
        ).collect()
        assert {(r.event_id, r.incident_id) for r in got} == brute
        # no dup pairs out of the bucket explode
        assert len(got) == len(brute)

    def test_inverted_and_empty_intervals_match_nothing(self, spark):
        pts = spark.createDataFrame(
            pd.DataFrame({"event_id": [1], "ts": [_ts(100)]})
        )
        ivs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "incident_id": [1, 2],
                    "start_us": [200_000_000, 100_000_000],
                    "end_us": [100_000_000, 100_000_000],
                }
            )
        )
        assert interval_join(pts, ivs).count() == 0


class TestRandomizedParity:
    def test_asof_matches_pandas_merge_asof(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        n_l, n_r = 400, 150
        left = pd.DataFrame(
            {
                "event_id": range(n_l),
                "user_id": rng.integers(0, 12, n_l),
                "ts": [_ts(float(s)) for s in rng.integers(0, 10_000, n_l)],
            }
        )
        right = pd.DataFrame(
            {
                "event_id": range(1000, 1000 + n_r),
                "user_id": rng.integers(0, 12, n_r),
                # coarse grid forces equal-ts collisions on the right
                "ts": [_ts(float(s)) for s in rng.integers(0, 10_000, n_r) // 100 * 100],
            }
        )
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                key="user_id", ts="ts",
                payload=["event_id"], tiebreak="event_id",
            )
            .toPandas()
            .set_index("event_id")["asof_event_id"]
            .sort_index()
        )
        # merge_asof picks the LAST right row among equal (key, ts) in
        # input order; sorting right by (ts, event_id) makes that the
        # greatest event_id — our documented tiebreak
        expect = (
            pd.merge_asof(
                left.sort_values("ts", kind="stable"),
                right.sort_values(["ts", "event_id"], kind="stable"),
                on="ts", by="user_id", direction="backward",
                suffixes=("", "_r"),
            )
            .set_index("event_id")["event_id_r"]
            .sort_index()
        )
        assert ((got.isna() == expect.isna()).all()
                and (got.dropna() == expect.dropna()).all())

    def test_sessionize_matches_brute(self, spark):
        import numpy as np

        rng = np.random.default_rng(13)
        n = 500
        pdf = pd.DataFrame(
            {
                "event_id": range(n),
                "user_id": rng.integers(0, 10, n),
                "ts": [_ts(float(s)) for s in rng.integers(0, 100_000, n)],
            }
        )
        gap = 300.0
        got = (
            sessionize(spark.createDataFrame(pdf), gap_s=gap)
            .toPandas()
            .set_index("event_id")["session_idx"]
        )
        for _, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
            idx, prev = 0, None
            for _, row in grp.iterrows():
                if prev is None or (row.ts - prev).total_seconds() > gap:
                    idx += 1
                prev = row.ts
                assert got.loc[row.event_id] == idx


class TestRollupCounts:
    def test_cascade_equals_direct(self, spark):
        import numpy as np

        from pyshp_spark.operators.temporal import rollup_counts

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "event_id": range(400),
                "event_type": rng.choice(["a", "b"], 400),
                "ts": [_ts(float(s)) for s in rng.integers(0, 200_000, 400)],
            }
        )
        df = spark.createDataFrame(pdf)
        out = rollup_counts(df, levels_s=[60, 3600, 86400]).toPandas()
        us = pdf.assign(us=[int(t.timestamp() * 1e6) for t in pdf.ts])
        for lvl in (60, 3600, 86400):
            lvl_us = lvl * 1_000_000
            direct = (
                us.assign(bucket=us.us // lvl_us * lvl_us)
                .groupby(["bucket", "event_type"])
                .size()
            )
            got = out[out.level_s == lvl].set_index(["bucket_us", "event_type"])["n"]
            assert got.sort_index().equals(
                direct.sort_index().astype("int64")
            ), lvl

    def test_levels_must_nest(self, spark):
        from pyshp_spark.operators.temporal import rollup_counts

        df = spark.createDataFrame(
            pd.DataFrame({"event_type": ["a"], "ts": [_ts(0)]})
        )
        with pytest.raises(ValueError, match="nest"):
            rollup_counts(df, levels_s=[60, 90])
        with pytest.raises(ValueError, match="ascending"):
            rollup_counts(df, levels_s=[3600, 60])


class TestKmvDistinct:
    def test_exact_below_k_and_estimate_above(self, spark):
        from pyshp_spark.operators.sketch import kmv_distinct

        small = spark.createDataFrame(
            [(1,), (2,), (3,), (2,), (1,), (None,)], "v bigint"
        )
        r = kmv_distinct(small, "v", k=64).collect()[0]
        assert (r.k_actual, r.estimate) == (3, 3)  # exact, nulls excluded

        # a float column must be rejected for the knuth flavor, not
        # silently cast (it would collapse 1.2 and 1.9 into one hash)
        floats = spark.createDataFrame(pd.DataFrame({"v": [1.2, 1.9]}))
        with pytest.raises(ValueError, match="integer column"):
            kmv_distinct(floats, "v", k=64)

        big = spark.createDataFrame(pd.DataFrame({"v": range(20_000)}))
        r = kmv_distinct(big, "v", k=256).collect()[0]
        assert r.k_actual == 256
        assert 20_000 * 0.8 < r.estimate < 20_000 * 1.2  # ~1/sqrt(k) error

    def test_k_bounded_plan(self, spark):
        from pyshp_spark.operators.sketch import kmv_distinct

        df = spark.createDataFrame(pd.DataFrame({"v": range(100)}))
        mins_plan = (
            kmv_distinct(df, "v", k=16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in mins_plan  # k-bounded, no full sort


class TestAsofForward:
    def test_forward_matches_pandas_merge_asof(self, spark):
        import numpy as np

        rng = np.random.default_rng(17)
        n_l, n_r = 300, 120
        left = pd.DataFrame(
            {
                "event_id": range(n_l),
                "user_id": rng.integers(0, 10, n_l),
                "ts": [_ts(float(s)) for s in rng.integers(0, 8_000, n_l)],
            }
        )
        right = pd.DataFrame(
            {
                "event_id": range(1000, 1000 + n_r),
                "user_id": rng.integers(0, 10, n_r),
                # coarse grid forces equal-ts collisions on the right
                "ts": [_ts(float(s)) for s in rng.integers(0, 8_000, n_r) // 100 * 100],
            }
        )
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                key="user_id", ts="ts",
                payload=["event_id"], tiebreak="event_id",
                direction="forward",
            )
            .toPandas()
            .set_index("event_id")["asof_event_id"]
            .sort_index()
        )
        # forward merge_asof picks the FIRST right row at ts >= l.ts;
        # right sorted by (ts, event_id) makes that the smallest
        # event_id among equal-ts rows — our documented forward tiebreak
        expect = (
            pd.merge_asof(
                left.sort_values("ts", kind="stable"),
                right.sort_values(["ts", "event_id"], kind="stable"),
                on="ts", by="user_id", direction="forward",
                suffixes=("", "_r"),
            )
            .set_index("event_id")["event_id_r"]
            .sort_index()
        )
        assert ((got.isna() == expect.isna()).all()
                and (got.dropna() == expect.dropna()).all())

    def test_direction_validated(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"event_id": [1], "user_id": [1], "ts": [_ts(0)]})
        )
        with pytest.raises(ValueError, match="direction"):
            asof_join(df, df, key="user_id", ts="ts",
                      payload=["event_id"], direction="nearest")
