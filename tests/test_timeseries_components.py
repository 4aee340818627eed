"""resample/fill_gaps and connected_components semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.operators.dedup import connected_components
from pandabase_spark.operators.timeseries import fill_gaps, resample


@pytest.fixture()
def sparse_events(spark):
    rows = [
        ("a", "2024-01-01 00:01:00", 1.0),
        ("a", "2024-01-01 00:10:00", 2.0),
        ("a", "2024-01-01 01:05:00", 3.0),   # one-hour gap → 3 empty bins
        ("b", "2024-01-01 00:20:00", 5.0),
    ]
    pdf = pd.DataFrame(rows, columns=["g", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_resample_bins(sparse_events):
    binned = resample(
        sparse_events, ts_col="ts", interval_seconds=900, group_cols=["g"],
        aggs={"n": F.count(F.lit(1)), "v": F.sum("value")},
    )
    rows = {(r["g"], r["bin_epoch"]): (r["n"], r["v"]) for r in binned.collect()}
    # both 00:01 and 00:10 land in the 00:00 bin
    t0 = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    assert rows[("a", t0)] == (2, 3.0)
    assert rows[("a", t0 + 3900 // 900 * 900)][0] == 1  # 01:00 bin
    assert len([k for k in rows if k[0] == "b"]) == 1


def test_fill_gaps_densifies_per_group(sparse_events):
    binned = resample(
        sparse_events, ts_col="ts", interval_seconds=900, group_cols=["g"],
        aggs={"n": F.count(F.lit(1))},
    )
    dense = fill_gaps(binned, interval_seconds=900, group_cols=["g"], fill={"n": 0})
    a = dense.where(F.col("g") == "a").orderBy("bin_epoch").collect()
    # span 00:00 → 01:00 = 5 bins, contiguous
    assert len(a) == 5
    assert [r["n"] for r in a] == [2, 0, 0, 0, 1]
    epochs = [r["bin_epoch"] for r in a]
    assert all(b - a == 900 for a, b in zip(epochs, epochs[1:]))
    # group b has a single bin — no global spine leakage
    assert dense.where(F.col("g") == "b").count() == 1


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_1 long, id_2 long",
    )
    comp = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_deep_chain(spark):
    """A path graph exercises multi-round label propagation."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_1 long, id_2 long"
    )
    comp = {r["id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_forward_fill_semantics(spark):
    import datetime as dt

    from pandabase_spark.operators.timeseries import forward_fill
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, "a", t0, None),                               # leading null stays
        (2, "a", t0 + dt.timedelta(minutes=1), 5.0),
        (3, "a", t0 + dt.timedelta(minutes=2), None),     # -> 5.0
        (4, "a", t0 + dt.timedelta(minutes=3), 7.0),
        (5, "a", t0 + dt.timedelta(minutes=4), None),     # -> 7.0
        (6, "b", t0 + dt.timedelta(minutes=5), None),     # other group: null
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "ts", "v"])
    out = forward_fill(
        df, ts_col="ts", value_cols=["v"], group_cols=["grp"],
        order_tiebreak=["id"],
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: None, 2: 5.0, 3: 5.0, 4: 7.0, 5: 7.0, 6: None}


def test_linear_interpolate_matches_pandas(spark):
    """linear_interpolate must equal pandas interpolate(method='index',
    limit_direction='both') per group, including edge extrapolation
    and irregular spacing."""
    import numpy as np
    import pandas as pd

    from pandabase_spark.operators.timeseries import linear_interpolate

    rows = []
    for g, series in {
        "a": [(0, 10.0), (10, None), (20, None), (30, 40.0), (45, None),
              (50, 0.0)],
        "b": [(0, None), (5, 2.0), (10, None)],          # both edges
        "c": [(0, None), (7, None)],                     # all null
    }.items():
        rows += [(g, t, v) for t, v in series]
    pdf = pd.DataFrame(rows, columns=["g", "t", "v"])
    sdf = spark.createDataFrame(pdf.astype({"t": "int64"}))
    got = (
        linear_interpolate(
            sdf, ts_col="t", value_col="v", group_cols=["g"], out_col="vi"
        )
        .toPandas()
        .sort_values(["g", "t"], ignore_index=True)
    )
    want_parts = []
    for g, grp in pdf.groupby("g"):
        s = grp.set_index("t")["v"]
        want_parts.append(
            s.interpolate(method="index", limit_direction="both")
            .rename("vi").reset_index().assign(g=g)
        )
    want = (
        pd.concat(want_parts)[["g", "t", "vi"]]
        .sort_values(["g", "t"], ignore_index=True)
    )
    a, b = got["vi"].to_numpy(), want["vi"].to_numpy()
    assert ((np.isnan(a) & np.isnan(b)) | (np.abs(a - b) < 1e-12)).all(), (
        got, want,
    )


def test_ewma_matches_manual_recurrence(spark):
    """Span-4 EWMA equals the hand-computed truncated weighted mean,
    including the short-history head normalization."""
    from pandabase_spark.operators.timeseries import ewma

    vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], ["g", "t", "v"]
    )
    out = {
        r["t"]: r["ewma"]
        for r in ewma(
            df, "v", "t", alpha=0.5, span=4, group_cols=["g"]
        ).collect()
    }
    ws = [1.0, 0.5, 0.25, 0.125]
    for t in range(5):
        hist = vals[max(0, t - 3): t + 1][::-1]  # newest first
        want = sum(v * w for v, w in zip(hist, ws)) / sum(ws[: len(hist)])
        assert out[t] == pytest.approx(want, rel=1e-12), t
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, "v", "t", alpha=0.0)


def test_scd2_history_intervals(spark):
    """Consecutive duplicates collapse; intervals chain exactly
    (valid_to == next valid_from); the last state is open-ended."""
    from pandabase_spark.operators.timeseries import scd2_history

    rows = [
        (1, "a", 100), (1, "a", 200), (1, "b", 300),
        (1, "b", 400), (1, "a", 500),
        (2, "x", 100),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "t"])
    h = sorted(
        (
            (r["k"], r["state"], r["valid_from"], r["valid_to"], r["version"])
            for r in scd2_history(df, "k", "s", "t").collect()
        )
    )
    assert h == [
        (1, "a", 100, 300, 1),
        (1, "a", 500, None, 3),
        (1, "b", 300, 500, 2),
        (2, "x", 100, None, 1),
    ]
