"""docs/SCALING.md coverage policy, machine-checked (r9 VERDICT #7):
every registered query is either in tools/scale_probe.py's probe list
or in its EXEMPT map with a written reason — disjointly, with no stale
names. A query registered without a classification fails here, so the
policy cannot silently rot as the surface grows."""

from __future__ import annotations

import importlib.util
from pathlib import Path


def _load_scale_probe():
    path = Path(__file__).resolve().parent.parent / "tools" / "scale_probe.py"
    spec = importlib.util.spec_from_file_location("scale_probe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_registered_query_is_probed_or_exempted():
    sp = _load_scale_probe()
    assert sp.coverage_errors() == []


def test_exemption_reasons_are_substantive():
    sp = _load_scale_probe()
    for reason, names in sp.EXEMPT_GROUPS:
        assert len(reason) >= 40, f"one-liner exemption reason: {reason!r}"
        assert names, f"empty exemption group: {reason!r}"
