"""Driver-visible enumeration order is load-bearing (the correctness
driver samples the FIRST ~50 names from plans.queries()), and since the
round-11 split of plans/llm.py into family modules it must not depend
on module organization. These tests pin the contract:

- every registered query appears in canonical_order.ORDER (and vice
  versa) — a new query must be added to ORDER in the same commit that
  registers it, exactly like the SCALING.md coverage rule;
- the enumeration is exactly head (_PRIORITY + _FORWARD) followed by
  ORDER's tail — so a file move or import reorder can never reshuffle
  what the driver sees;
- no plans source file grows past 2,500 lines again (the r10 verdict's
  merge-hazard bound that motivated the split).
"""

from __future__ import annotations

from pathlib import Path

from fluvio_demo_apps_rust_spark import plans
from fluvio_demo_apps_rust_spark.plans import _FORWARD, _PRIORITY, REGISTRY
from fluvio_demo_apps_rust_spark.plans.canonical_order import ORDER


def test_every_query_in_canonical_order():
    registered = set(REGISTRY)
    listed = set(ORDER)
    assert registered - listed == set(), (
        "registered but missing from canonical_order.ORDER (append them "
        f"there in the registering commit): {sorted(registered - listed)}"
    )
    assert listed - registered == set(), (
        f"in ORDER but not registered (stale names): {sorted(listed - registered)}"
    )
    assert len(ORDER) == len(set(ORDER)), "duplicate names in ORDER"


def test_enumeration_is_head_then_canonical_tail():
    names = list(plans.queries().keys())
    head = list(dict.fromkeys(_PRIORITY))
    head += [n for n in _FORWARD if n in REGISTRY and n not in head]
    expected = head + [n for n in ORDER if n not in set(head)]
    assert names == expected


def test_no_plans_file_exceeds_2500_lines():
    root = Path(plans.__file__).parent
    fat = {
        str(p.relative_to(root.parent)): n
        for p in root.rglob("*.py")
        if (n := sum(1 for _ in p.open())) > 2500
    }
    assert fat == {}, f"split these modules (r10 verdict #5 bound): {fat}"
