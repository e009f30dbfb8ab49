"""Shared frozen-policy rollout loop for the rates models.

The three policy machineries (`swaption._policy_machinery`,
`hullwhite._hw_policy_machinery`, `g2pp._g2_policy_machinery`) share one
rollout structure: walk the remaining coupon dates, exercise when the
intrinsic beats the fitted continuation (last date: any positive
intrinsic), absorb the cashflow discounted to 0, and advance the state
by one exact tenor step on (tag, date)-keyed draws.  That loop lives
here ONCE; each model supplies its physics as callbacks.

Bitwise contract: the callbacks are composed in exactly the order the
previously-inlined loops used — in particular ``cashflow`` owns the
WHOLE discounted-cashflow expression (multiplication association
differs per model: Vasicek ``ex * exp(-y)`` vs Hull-White
``ex * p0[u] * exp(-y - c[u])``), so the traced XLA graph is identical
and the bitwise gates (AB lower == LSMC, exposure telescoping to the
policy price) are preserved.

Reference analogue: the resume-state rollouts of `trajectories.cuh`
115-191 (kernels resuming from an intermediate (Ik, Sk, Tk)) driving
the inner stage of `nmc.cuh` — here the "resume" is the frozen exercise
policy re-rolled from each date's realized state.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["check_rollout_dates", "frozen_policy_value"]


def check_rollout_dates(n_ex: int) -> None:
    """Rollout draw counters key by tag*64 + date — 64 dates max."""
    if n_ex > 64:
        raise ValueError(
            "rollout draw counters key by tag*64 + date: "
            f"n_payments must be <= 64, got {n_ex}")


def frozen_policy_value(n_ex, i, state, ids, tag, *, draws, step,
                        exercise, continuation, cashflow):
    """Value (discounted to 0) at date ``i`` of a fitted policy rolled
    from ``state`` (a tuple of per-path f32 arrays).

    ``draws(ids, tag, u)`` -> per-date noise tuple;
    ``step(state, noise)`` -> state at the next coupon date;
    ``exercise(u, state)`` -> nonnegative intrinsic at date u;
    ``continuation(u, state)`` -> fitted forward continuation value;
    ``cashflow(u, ex, state)`` -> the FULL discounted cashflow
    expression (owns its multiplication order, see module docstring).
    """
    val = jnp.zeros_like(state[0])
    done = jnp.zeros(state[0].shape, bool)
    for u in range(i, n_ex):
        ex = exercise(u, state)
        if u < n_ex - 1:
            cont = continuation(u, state)
            take = jnp.logical_and(ex > 0.0, ex > cont)
        else:
            take = ex > 0.0
        take = jnp.logical_and(take, jnp.logical_not(done))
        val = jnp.where(take, cashflow(u, ex, state), val)
        done = jnp.logical_or(done, take)
        if u < n_ex - 1:
            state = step(state, draws(ids, tag, u))
    return val
