"""Model-based randomized DML walks over one keyed table.

Every mutation (append / upsert / DV + rewrite delete / DV + rewrite
update / compact / rebucket) is mirrored on a driver-side dict model;
after EVERY step ``read_table`` must equal the model exactly. This
covers interleavings no example test enumerates — the round-6
cross-DV contamination bug (delete -> re-insert -> second DV in the
same bucket silently dropping the re-inserted row) was exactly such a
sequence, so the upsert step deliberately draws from recently-deleted
keys. Snapshots are captured at random points and re-read via
``version=`` at the end, asserting time travel holds across the whole
mixed history (reference:tests/test_sql.py exercises each verb once;
this is the composition torture test the reference never had).
"""

from __future__ import annotations

import random

import pytest


def _rows(keys):
    return [(k, k * 0.25, f"s{k}") for k in keys]


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, schema="k bigint, v double, s string")


def _read(catalog, t):
    return {
        r.k: (r.v, r.s) for r in catalog.read_table(t).collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_random_dml_walk_matches_model(spark, catalog, seed):
    rng = random.Random(seed)
    t = f"walk_{seed}"
    init = _rows(range(0, 40))
    catalog.to_table(_mk_df(spark, init), t, keys=["k"], num_buckets=4)
    model = {k: (v, s) for k, v, s in init}
    deleted: set[int] = set()
    next_fresh = 1000
    snapshots: list[tuple[int, dict]] = []

    ops = (
        ["append"] * 3 + ["upsert"] * 4 + ["delete"] * 4
        + ["update"] * 4 + ["compact", "rebucket"]
    )
    for step in range(22):
        op = rng.choice(ops)
        if op == "append":
            n = rng.randint(1, 8)
            keys = list(range(next_fresh, next_fresh + n))
            next_fresh += n
            catalog.to_table(
                _mk_df(spark, _rows(keys)), t, keys=["k"], how="append"
            )
            for k, v, s in _rows(keys):
                model[k] = (v, s)
        elif op == "upsert":
            # draw from live keys, RECENTLY DELETED keys (the re-insert
            # path that interacts with live DVs), and fresh keys
            pool = (
                rng.sample(sorted(model), min(len(model), 6))
                + rng.sample(sorted(deleted), min(len(deleted), 3))
                + [next_fresh]
            )
            next_fresh += 1
            rows = [(k, k * 0.25 + 2.0, f"u{k}") for k in pool]
            catalog.to_table(_mk_df(spark, rows), t, keys=["k"], how="upsert")
            for k, v, s in rows:
                model[k] = (v, s)
                deleted.discard(k)
        elif op == "delete":
            m, r = rng.choice([3, 5, 7]), rng.randint(0, 2)
            strat = rng.choice(["dv", "rewrite", "auto"])
            n = catalog.delete_rows(t, f"k % {m} = {r}", strategy=strat)
            hit = [k for k in model if k % m == r]
            assert n == len(hit)
            for k in hit:
                del model[k]
                deleted.add(k)
        elif op == "update":
            strat = rng.choice(["dv", "rewrite", "auto"])
            if rng.random() < 0.5:
                m, r = rng.choice([2, 4]), rng.randint(0, 1)
                pred = f"k % {m} = {r}"
                hit = [k for k in model if k % m == r]
            else:
                cut = rng.choice([5.0, 20.0, 200.0])
                pred = f"v < {cut}"
                hit = [k for k, (v, _) in model.items() if v < cut]
            n = catalog.update_rows(
                t, pred, {"v": "v + 1.5", "s": "upper(s)"}, strategy=strat
            )
            assert n == len(hit)
            for k in hit:
                v, s = model[k]
                model[k] = (v + 1.5, s.upper())
        elif op == "compact":
            # vacuum=False keeps every snapshot plannable for the
            # time-travel sweep below (retention has its own tests)
            catalog.compact(t, vacuum=False)
        elif op == "rebucket":
            catalog.rebucket_table(t, rng.choice([2, 4, 8]))

        assert _read(catalog, t) == model, f"seed={seed} step={step} op={op}"
        if rng.random() < 0.25:
            snapshots.append((catalog._manifest(t)["v"], dict(model)))

    # time travel across the whole mixed history (no vacuum ran, so
    # every captured snapshot must still be plannable and exact)
    for ver, snap in snapshots:
        got = {
            r.k: (r.v, r.s)
            for r in catalog.read_table(t, version=ver).collect()
        }
        assert got == snap, f"seed={seed} version={ver}"
