"""Per-row routing policy: penalize/backoff/quarantine dispositions.

Reference analog: ``RoutedException(relationship, penalize)``
(``…/exceptions/RoutedException.kt:5-10``) and its handling in the Jhove
processor (``…/processors/Jhove.kt:539-549``): a failed FlowFile is
routed to a named relationship, and ``session.penalize`` defers its next
processing attempt (NiFi's backoff). Distributed, the FlowFile becomes a
row and the policy becomes data: a ``RoutePolicy`` maps each ``route``
value a validator emitted to a disposition —

* ``pass``        — row proceeds downstream,
* ``retry``       — transient failure: row is re-queued with
  ``attempt + 1`` and, when the rule penalizes, an exponential-backoff
  delay (``penalty_base * 2^attempt``); rows exceeding ``max_retries``
  fall through to quarantine,
* ``quarantine``  — permanent failure: row leaves the main stream into
  the quarantine output (never raises, never blocks the batch),
* ``fail``        — poison the whole batch (the reference's
  folder-level "one file fails the folder" semantics, Jhove.kt:355-357)
  — reserved for invariant violations, not data errors.

``apply_route_policy`` is a vectorized ``map_batches`` transform;
``route_with_retries`` is the driving loop that feeds ``retry`` rows
back through a stage until none remain or retries are exhausted.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DISPOSITIONS = ("pass", "retry", "quarantine", "fail")


@dataclass(frozen=True)
class RouteRule:
    disposition: str = "pass"
    penalize: bool = False
    max_retries: int = 3
    penalty_base_ms: int = 1000  # backoff = base * 2^attempt

    def __post_init__(self):
        if self.disposition not in DISPOSITIONS:
            raise ValueError(f"unknown disposition {self.disposition!r}")


@dataclass(frozen=True)
class RoutePolicy:
    """route value -> RouteRule; unmapped routes get ``default``."""

    rules: dict[str, RouteRule]
    default: RouteRule = RouteRule("quarantine")

    def rule(self, route: str) -> RouteRule:
        return self.rules.get(route, self.default)


# The engine's default: ok passes; malformed content is data-permanent
# (quarantine); transient-looking routes retry with penalty.
DEFAULT_POLICY = RoutePolicy(
    rules={
        "ok": RouteRule("pass"),
        "empty": RouteRule("quarantine"),
        "malformed": RouteRule("quarantine"),
        "schema_invalid": RouteRule("quarantine"),
        "transient": RouteRule("retry", penalize=True, max_retries=3),
    }
)


def apply_route_policy(
    batch: pa.Table,
    policy: RoutePolicy = DEFAULT_POLICY,
    route_col: str = "route",
    attempt_col: str = "attempt",
) -> pa.Table:
    """Vectorized disposition assignment. Adds/updates:

    * ``disposition`` — pass/retry/quarantine/fail after retry budgeting
      (a retry rule whose budget is exhausted becomes quarantine),
    * ``attempt``     — incremented for retried rows,
    * ``penalty_ms``  — backoff delay for penalized retries, else 0.

    Raises RuntimeError when any row maps to ``fail`` — the whole-batch
    poison semantics of the reference's folder-level failure.
    """
    n = batch.num_rows
    routes = batch[route_col].to_pylist()
    if attempt_col in batch.column_names:
        attempts = batch[attempt_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        attempts = np.zeros(n, dtype=np.int64)

    # per-distinct-route vectorization: len(set(routes)) rules, not n
    disp = np.empty(n, dtype=object)
    penalty = np.zeros(n, dtype=np.int64)
    new_attempt = attempts.copy()
    routes_arr = np.asarray(routes, dtype=object)
    for r in set(routes):
        rule = policy.rule(r)
        m = routes_arr == r
        if rule.disposition == "retry":
            exhausted = m & (attempts >= rule.max_retries)
            live = m & ~exhausted
            disp[exhausted] = "quarantine"
            disp[live] = "retry"
            new_attempt[live] += 1
            if rule.penalize:
                penalty[live] = rule.penalty_base_ms * (
                    2 ** np.minimum(attempts[live], 20)
                )
        else:
            disp[m] = rule.disposition
    if (disp == "fail").any():
        bad = routes_arr[disp == "fail"]
        raise RuntimeError(
            f"route(s) {sorted(set(bad))} are policy 'fail' — batch poisoned"
        )

    out = batch
    for col in ("disposition", attempt_col, "penalty_ms"):
        if col in out.column_names:
            out = out.drop_columns([col])
    out = out.append_column("disposition", pa.array(disp.tolist(), type=pa.string()))
    out = out.append_column(attempt_col, pa.array(new_attempt))
    out = out.append_column("penalty_ms", pa.array(penalty))
    return out


def split_by_disposition(batch: pa.Table) -> dict[str, pa.Table]:
    """One routed batch -> {'pass': …, 'retry': …, 'quarantine': …} —
    the relationship fan-out of a NiFi processor as plain filters."""
    out = {}
    for d in ("pass", "retry", "quarantine"):
        out[d] = batch.filter(pc.equal(batch["disposition"], d))
    return out


def route_with_retries(
    batch: pa.Table,
    stage,
    policy: RoutePolicy = DEFAULT_POLICY,
    route_col: str = "route",
    max_rounds: int = 10,
) -> tuple[pa.Table, pa.Table]:
    """Drive ``stage`` (a batch -> batch transform emitting ``route``)
    with retry feedback: retry rows re-enter the stage with their
    incremented attempt count until none remain (every retry either
    passes or exhausts into quarantine). Returns (passed, quarantined).

    This is the single-actor form; distributed, the retry stream is a
    Dataset union per round with the same policy columns.

    Schema contract: BOTH returned tables always carry the routed schema
    (stage outputs + disposition/attempt/penalty_ms), including when one
    side — or the whole input — is empty, so callers can concat results
    across batches without per-batch schema drift. Rows that exhaust
    ``max_rounds`` land in the quarantine output still carrying their
    final ``disposition='retry'`` (that is what round exhaustion means).
    """
    passed, quarantined = [], []
    # establish the routed schema up front (works for empty input too:
    # stage and policy are applied to the 0-row batch)
    routed_schema = apply_route_policy(
        stage(batch.slice(0, 0)), policy, route_col=route_col
    ).schema
    pending = batch
    for _ in range(max_rounds):
        if pending.num_rows == 0:
            break
        routed = apply_route_policy(stage(pending), policy, route_col=route_col)
        parts = split_by_disposition(routed)
        if parts["pass"].num_rows:
            passed.append(parts["pass"])
        if parts["quarantine"].num_rows:
            quarantined.append(parts["quarantine"])
        pending = parts["retry"]
    else:
        if pending.num_rows:
            # max_rounds exhausted: the still-retrying rows (already in
            # the routed schema) are quarantined as-is
            quarantined.append(pending)

    def _cat(parts: list[pa.Table]) -> pa.Table:
        if not parts:
            return routed_schema.empty_table()
        return pa.concat_tables(parts, promote_options="permissive")

    return _cat(passed), _cat(quarantined)
