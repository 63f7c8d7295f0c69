"""Property-based checks of the mixing operators against sequential
reference implementations: pack_shards must equal a per-packer running
sum simulation for arbitrary token distributions, and weighted_mix's
copy counts must follow its documented hash rule exactly."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _md5_bucket(value: str, salt: str, mod: int = 10_000) -> int:
    h = hashlib.md5((salt + value).encode()).hexdigest()
    return int(h[:15], 16) % mod


rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 500)),  # (order_key, n_tokens)
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, budget=st.integers(100, 2000))
def test_pack_shards_matches_sequential_packer(spark, data, budget):
    from aqueducts_spark.operators.mixing import pack_shards

    df = spark.createDataFrame(data, "ord long, n_tokens long")
    got = {
        r.ord: (r.pack_part, r.shard_id)
        for r in pack_shards(
            df, "n_tokens", "ord", budget=budget, parts=4
        ).collect()
    }
    # sequential reference: hash rows to packers, then fill shards in
    # ord order, advancing when the cumulative count crosses a budget
    # multiple (same definition as the operator's docstring)
    packers: dict[int, list[tuple[int, int]]] = {}
    for ord_key, n in data:
        part = _md5_bucket(str(ord_key), "pack:", 4)
        packers.setdefault(part, []).append((ord_key, n))
    want = {}
    for part, items in packers.items():
        cum = 0
        for ord_key, n in sorted(items):
            # start-offset binning: the shard is where the row STARTS
            want[ord_key] = (part, cum // budget)
            cum += n
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(0, 1000), min_size=1, max_size=30, unique=True),
    weight=st.floats(0.0, 4.0, allow_nan=False, width=16),
)
def test_weighted_mix_copy_counts_follow_hash_rule(spark, ids, weight):
    from aqueducts_spark.operators.mixing import weighted_mix

    df = spark.createDataFrame([(i, "g") for i in ids], "id long, grp string")
    out = weighted_mix(df, "grp", "id", {"g": weight}).collect()
    by_id: dict[int, int] = {}
    for r in out:
        by_id[r.id] = by_id.get(r.id, 0) + 1
    whole = int(weight)
    frac = weight - whole
    for i in ids:
        # half-UP threshold (floor(x+0.5)), the documented rule — NOT
        # Python round(), whose half-to-even differs on .5 boundaries
        expected = whole + (
            1 if _md5_bucket(str(i), "mix:") < int(frac * 10_000 + 0.5) else 0
        )
        assert by_id.get(i, 0) == expected, (i, weight)
    # copy column is 1..n for every duplicated row
    copies: dict[int, set] = {}
    for r in out:
        copies.setdefault(r.id, set()).add(r.mix_copy)
    for i, seen in copies.items():
        assert seen == set(range(1, by_id[i] + 1))
