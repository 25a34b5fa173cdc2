"""Driver-contract registry invariants.

The round driver's correctness harness records only the FIRST 50
registered queries (measured round 3: entries 51+ silently fell out of
the official record).  These pins make any future registry drift a
test failure instead of a silent loss of verification coverage.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50


def test_registered_gate_count_is_exactly_the_driver_window():
    qs = entrymod.queries()
    assert len(qs) == DRIVER_WINDOW, (
        f"queries() registers {len(qs)} gates; the driver records only the "
        f"first {DRIVER_WINDOW} — keep the registry at exactly {DRIVER_WINDOW}"
    )


def test_every_oracle_backed_gate_is_registered_before_rows_only():
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    # every oracle has a registered gate, inside the window
    missing = [k for k in oracles if k not in qs]
    assert not missing, f"oracle_sql() entries without a registered gate: {missing}"
    # oracle-backed gates come first: once the rows-only tail starts, no
    # oracle-backed gate may follow (an insertion in the middle would
    # push oracle gates toward — eventually past — the window edge)
    seen_rows_only = False
    for name in qs:
        if name in oracles:
            assert not seen_rows_only, (
                f"oracle-backed gate {name!r} is registered after a rows-only "
                "gate; keep all oracle-backed gates at the head of the registry"
            )
        else:
            seen_rows_only = True


def test_extras_are_disjoint_and_rows_only():
    qs = entrymod.queries()
    extras = entrymod.extra_queries()
    oracles = entrymod.oracle_sql()
    assert not (set(qs) & set(extras))
    # extras carry no oracle (an oracle-backed gate outside the driver
    # window would never land in the official record)
    backed = [k for k in extras if k in oracles]
    assert not backed, f"oracle-backed gates hidden in extras: {backed}"
