"""Pins for the r10 verdict item-1 rotation fix: a key whose oracle
postdates its latest driver sample (latest row was rows-only
``no_oracle`` but the registry now carries an oracle) must re-enter the
next 50-key driver sample so its hash gate actually runs driver-side.
The promotion is derived from the CORRECTNESS round files vs the live
registry — no stamp file — and self-clears once a hash row lands."""
from __future__ import annotations

from go_batch_processor_spark import registry

registry._ensure_loaded()


def test_oracle_upgraded_keys_enter_next_sample():
    """Every checked key that is oracled NOW but whose latest driver row
    was rows-only must be inside the upcoming first-50 sample (durable
    form of the r10 verdict's named trio — pagerank, modularity,
    label_propagation as of the r10 round files; the set shrinks to
    empty as hash rows land and the assertion stays vacuously green)."""
    counts, latest_fail, latest_rows_only = registry._driver_check_history()
    order = registry.driver_sample_order(list(registry.REGISTRY))
    sample = set(order[:50])
    upgraded = [
        k
        for k in order
        if counts.get(k, 0)
        and latest_rows_only.get(k, False)
        and registry.REGISTRY[k].oracle is not None
        and not latest_fail.get(k, False)
    ]
    missing = [k for k in upgraded if k not in sample]
    assert not missing, missing


def test_promotion_rule_orders_between_never_checked_and_checked():
    """Unit pin of the tier itself under synthetic history: an oracled
    key with a rows-only latest row orders AHEAD of ordinary checked
    keys and BEHIND never-checked keys; a rows-only key (no oracle to
    gate) is NOT promoted by the same history."""
    names = list(registry.REGISTRY)
    oracled = [n for n in names if registry.REGISTRY[n].oracle is not None]
    rows_only_keys = [n for n in names if registry.REGISTRY[n].oracle is None]
    upgraded_key = oracled[0]
    never_key = oracled[1]
    plain_key = oracled[2]
    unpromoted_key = rows_only_keys[0]
    real = registry._driver_check_history

    def fake():
        counts = {n: 1 for n in names}
        del counts[never_key]
        latest_fail = {n: False for n in names}
        latest_rows_only = {n: False for n in names}
        latest_rows_only[upgraded_key] = True
        latest_rows_only[unpromoted_key] = True  # stays rows-only: no gate
        return counts, latest_fail, latest_rows_only

    registry._driver_check_history = fake
    try:
        order = registry.driver_sample_order(names)
    finally:
        registry._driver_check_history = real
    pos = {k: order.index(k) for k in
           (upgraded_key, never_key, plain_key, unpromoted_key)}
    assert pos[never_key] < pos[upgraded_key] < pos[plain_key]
    # the rows-only key saw the same rows-only history but has no oracle
    # to gate — it must NOT ride the promotion tier. (Rows-only keys
    # also order behind oracled keys within every tier, so comparing
    # against the promoted key's position is the stable check.)
    assert pos[unpromoted_key] > pos[plain_key] or pos[unpromoted_key] > pos[
        upgraded_key
    ]


def test_promotion_clears_once_hash_row_lands():
    """Simulate the next round recording a real hash row for an
    upgraded key: latest_rows_only flips False and the key drops back
    to the ordinary checked tier."""
    names = list(registry.REGISTRY)
    oracled = [n for n in names if registry.REGISTRY[n].oracle is not None]
    key0, key1 = oracled[0], oracled[1]
    real = registry._driver_check_history

    def fake(rows_only_flag):
        def inner():
            counts = {n: 1 for n in names}
            latest_fail = {n: False for n in names}
            latest_rows_only = {n: False for n in names}
            latest_rows_only[key0] = rows_only_flag
            return counts, latest_fail, latest_rows_only

        return inner

    try:
        registry._driver_check_history = fake(True)
        promoted = registry.driver_sample_order(names)
        registry._driver_check_history = fake(False)
        cleared = registry.driver_sample_order(names)
    finally:
        registry._driver_check_history = real
    assert promoted.index(key0) == 0  # only member of tier 2
    # cleared: same history for everyone -> key0 sits wherever ordinary
    # tier ordering puts it, no longer pinned to the front
    assert cleared.index(key0) > 0 or cleared.index(key1) < cleared.index(key0)
