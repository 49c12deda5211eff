"""Incremental JOIN-view maintenance — the classic IVM delta algebra
(Blakeley et al. 1986 "Efficiently Updating Materialized Views") for the
warehouse's precomputed join tables.

A materialized view V = A ⋈ B over append-only tables never needs the
base-to-base join re-run when batches ΔA / ΔB arrive:

    ΔV = (ΔA ⋈ B_old)  ∪  (A_old ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)
    V_new = V_old ∪ ΔV            (exact multiset equality — law-tested)

Cost scales with the DELTAS: every term has a delta on at least one
side, so at 100 TB each is a broadcast (small nightly batch) or a
co-located bucket join against ONE base, never base ⋈ base. This is the
join twin of plans/northstar.py::q_incremental_rollup's monoid-merge
aggregate maintenance (together they cover the two materialized-view
shapes a warehouse precomputes: joins and rollups).

Insert-only contract: deletes/updates route through the CDC MERGE
(operators/cdc.py + jobs/maintenance.py::merge_snapshot) BEFORE view
maintenance — classic IVM treats an update as delete+insert, and the
delete side requires keyed state this operator deliberately does not
carry (a deleted base row invalidates view rows found by a join, not a
key lookup). The reference scope is SURVEY §2.6 engine-added capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delta_join_rows(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """The view DELTA for V = A ⋈_on B (inner equi-join) under
    append-only inserts ΔA, ΔB. Union of the three delta terms; by the
    IVM law, V_old ∪ this == (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) as a row
    MULTISET. Each term joins a delta, so the planner broadcasts the
    batch side whenever it fits (the nightly-batch case)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return (
        delta_a.join(b_old, on_cols)
        .unionByName(a_old.join(delta_b, on_cols))
        .unionByName(delta_a.join(delta_b, on_cols))
    )
