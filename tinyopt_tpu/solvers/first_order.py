"""Stateful first-order step proposers: SGD-momentum, Adam/AdamW, L-BFGS.

The reference ships plain fixed-lr gradient descent (solvers/gd.h:131-134)
and lists "more optimizers: Adam, SGD, Precond CG, lbfgs" as roadmap work
(reference README.md:152); these are those optimizers, built as pure state
transitions so they run inside the same jitted ``lax.while_loop`` as
GD/GN/LM (optimizers/loop.py) and inherit the full accept/reject,
failure-budget, stop-reason, history, and Output machinery.

Contract with the loop:

* ``fo_init(opts, x0, spec)`` -> state pytree (lives in the loop carry).
* ``fo_on_build(opts, state, g, x, spec)`` -> state with the curvature
  pair between the previous and current BUILD points pushed (L-BFGS
  only; identity for the others).  The loop applies it gated on its
  ``rebuild`` flag, so ``(x_prev, g_prev)`` always refer to the last
  point whose gradient was actually computed; ``s = x ⊟ x_prev`` and
  ``y = g − g_prev`` are therefore a valid secant pair by construction,
  whatever path of rollbacks/probes connected the two builds.
* ``fo_propose(opts, state, g, lm_state, x_flat)`` -> ``(dx, state')``.
  ``state'`` is committed UNCONDITIONALLY: the parameters only move on
  accepted steps, but the optimizer state learns from every evaluation —
  a momentum/Adam direction that points uphill at the current point
  would otherwise be frozen by rejection and re-proposed forever, while
  integrating the same gradient a few more times turns it back into a
  descent direction.

No separate line search anywhere: every stateful proposal is scaled by
``lr · bad_factor₀ / bad_factor`` where ``bad_factor`` is the LM
schedule's compounding rejection scale already in the loop carry — it
doubles on every consecutive rejected step and resets on acceptance
(solvers/lm.py), so the loop's own accept/reject cycle performs exact
geometric backtracking (lr, lr/2, lr/4, …) with instant recovery.
Without it a rejected fixed-lr proposal would be re-proposed verbatim
forever (plain GD keeps the reference's behavior, solvers/gd.h).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..options import Options, SolverType

_I32 = jnp.int32


class SGDState(NamedTuple):
    v: jax.Array            #: (d,) momentum buffer


class AdamState(NamedTuple):
    m: jax.Array            #: (d,) first-moment estimate
    v: jax.Array            #: (d,) second-moment estimate
    t: jax.Array            #: () i32 PROPOSAL count (bias correction);
                            #: advances on every evaluation, including
                            #: rejected ones — a deliberate deviation
                            #: from textbook Adam (which never rejects),
                            #: consistent with the always-learning state


class BBState(NamedTuple):
    """Barzilai–Borwein adaptive-lr state (GDOptions.adaptive="bb")."""

    lr: jax.Array            #: () current step size
    g_prev: jax.Array        #: (d,) gradient at the last BUILD point
    x_prev: tuple            #: parameter pytree of the last BUILD point
    have_prev: jax.Array     #: () i32: (x_prev, g_prev) hold a real build


class LBFGSState(NamedTuple):
    S: jax.Array            #: (m, d) step ring buffer
    Y: jax.Array            #: (m, d) gradient-difference ring buffer
    rho: jax.Array          #: (m,) 1 / (sᵀy); 0 marks an empty/invalid slot
    head: jax.Array         #: () i32 next write slot
    count: jax.Array        #: () i32 pairs stored (≤ m)
    g_prev: jax.Array       #: (d,) gradient at the last BUILD point
    x_prev: tuple           #: parameter pytree of the last BUILD point
    have_prev: jax.Array    #: () i32: (x_prev, g_prev) hold a real build
                            #: (0 until the first rebuild — a warm start
                            #: skips iteration 0's build, so the zeros
                            #: init must never form a secant pair)


def fo_init(opts: Options, x0, spec):
    st = opts.solver_type
    d, dtype = spec.dims, spec.dtype
    if st == SolverType.GRADIENT_DESCENT and opts.gd.adaptive != "off":
        if opts.gd.adaptive != "bb":
            raise ValueError(
                f"unknown gd.adaptive={opts.gd.adaptive!r}; "
                "expected 'off' or 'bb'")
        return BBState(lr=jnp.asarray(opts.gd.lr, dtype),
                       g_prev=jnp.zeros((d,), dtype),
                       x_prev=x0,
                       have_prev=jnp.zeros((), _I32))
    if st == SolverType.SGD:
        return SGDState(v=jnp.zeros((d,), dtype))
    if st in (SolverType.ADAM, SolverType.ADAMW):
        return AdamState(m=jnp.zeros((d,), dtype),
                         v=jnp.zeros((d,), dtype),
                         t=jnp.zeros((), _I32))
    if st == SolverType.LBFGS:
        m = opts.lbfgs.memory
        return LBFGSState(S=jnp.zeros((m, d), dtype),
                          Y=jnp.zeros((m, d), dtype),
                          rho=jnp.zeros((m,), dtype),
                          head=jnp.zeros((), _I32),
                          count=jnp.zeros((), _I32),
                          g_prev=jnp.zeros((d,), dtype),
                          x_prev=x0,
                          have_prev=jnp.zeros((), _I32))
    return ()


def fo_on_build(opts: Options, state, g, x, spec):
    """Push the secant pair between the previous and current build points
    (s = x ⊟ x_prev, y = g − g_prev) and advance (x_prev, g_prev);
    identity for non-L-BFGS methods.

    Both endpoints carry freshly-computed gradients by construction (the
    loop applies this only on rebuild iterations), so the pair is valid
    regardless of the rollback/probe path between the two builds.  The
    pair is dropped (slot untouched) when s = 0 (no movement — e.g. a
    rebuild at the rolled-back point) or the curvature condition
    sᵀy > ε·sᵀs fails — standard positive-definiteness safeguarding.
    """
    if isinstance(state, BBState):
        # Barzilai–Borwein step size from the secant pair between the
        # previous and current build points: lr = sᵀy/yᵀy (the "short"
        # BB2 rule — more robust than sᵀs/sᵀy under non-convexity).
        # Invalid curvature (sᵀy ≤ 0, yᵀy = 0, non-finite) keeps the
        # previous lr; the warm-start guard mirrors L-BFGS below.
        from .. import manifold as mf
        s = mf.local(state.x_prev, x, spec)
        y = g - state.g_prev
        sy = jnp.vdot(s, y)
        yy = jnp.vdot(y, y)
        lr_bb = sy / jnp.where(yy > 0, yy, jnp.ones((), g.dtype))
        ok = ((state.have_prev != 0) & (sy > 0) & (yy > 0)
              & jnp.isfinite(lr_bb))
        return BBState(lr=jnp.where(ok, lr_bb, state.lr),
                       g_prev=g, x_prev=x,
                       have_prev=jnp.ones((), _I32))
    if opts.solver_type != SolverType.LBFGS:
        return state
    from .. import manifold as mf
    s = mf.local(state.x_prev, x, spec)
    y = g - state.g_prev
    sy = jnp.vdot(s, y)
    dtype = g.dtype
    # have_prev guards the warm-start case: with warm_start=(g0,) the
    # loop's first iteration is eval-only, so the first BUILD happens at
    # x1 while (x_prev, g_prev) still hold the x0/zeros init — pairing
    # them would store y = g1 − 0 (reproduced: cost oscillation).
    do = (state.have_prev != 0) & (
        sy > dtype.type(1e-10) * jnp.vdot(s, s))
    idx = state.head
    S = state.S.at[idx].set(jnp.where(do, s, state.S[idx]))
    Y = state.Y.at[idx].set(jnp.where(do, y, state.Y[idx]))
    rho = state.rho.at[idx].set(
        jnp.where(do, 1.0 / jnp.where(do, sy, jnp.ones((), dtype)),
                  state.rho[idx]))
    m = state.rho.shape[0]
    head = jnp.where(do, (state.head + 1) % m, state.head).astype(_I32)
    count = jnp.where(do, jnp.minimum(state.count + 1, m),
                      state.count).astype(_I32)
    return LBFGSState(S=S, Y=Y, rho=rho, head=head, count=count,
                      g_prev=g, x_prev=x, have_prev=jnp.ones((), _I32))


def _lbfgs_direction(state: LBFGSState, g):
    """Two-loop recursion: r ≈ H⁻¹g from the stored pairs (Nocedal &
    Wright, Alg. 7.4), over a ring buffer with ρ = 0 masking empty slots
    (a zero ρ makes the slot's alpha/beta contributions vanish, so no
    dynamic trip counts are needed — compiler-friendly fixed loops)."""
    m = state.rho.shape[0]
    dtype = g.dtype

    def newest_to_oldest(k):
        # k = 0 is the newest pair (head − 1), k = m − 1 the oldest.
        return (state.head - 1 - k) % m

    def loop1(k, carry):
        q, alphas = carry
        i = newest_to_oldest(k)
        a = state.rho[i] * jnp.vdot(state.S[i], q)
        q = q - a * state.Y[i]
        return q, alphas.at[i].set(a)

    q, alphas = jax.lax.fori_loop(
        0, m, loop1, (g, jnp.zeros((m,), dtype)))

    # Initial Hessian scaling γ = sᵀy / yᵀy of the newest valid pair.
    newest = (state.head - 1) % m
    yy = jnp.vdot(state.Y[newest], state.Y[newest])
    sy_newest = jnp.where(state.rho[newest] != 0,
                          1.0 / jnp.where(state.rho[newest] != 0,
                                          state.rho[newest],
                                          jnp.ones((), dtype)),
                          jnp.zeros((), dtype))
    gamma = jnp.where((state.count > 0) & (yy > 0), sy_newest / jnp.where(
        yy > 0, yy, jnp.ones((), dtype)), jnp.ones((), dtype))
    r = gamma * q

    def loop2(k, r):
        i = (state.head - state.count + k) % m     # oldest → newest
        b = state.rho[i] * jnp.vdot(state.Y[i], r)
        return r + (alphas[i] - b) * state.S[i]

    return jax.lax.fori_loop(0, m, loop2, r)


def fo_propose(opts: Options, state, g, lm_state, x_flat=None):
    """One proposal: ``(dx, state')``.  ``state'`` is committed by the
    loop UNCONDITIONALLY — the state learns from every evaluation, only
    the parameters are gated on acceptance (see module docstring).
    ``x_flat`` is the flattened parameter vector, required only by
    AdamW's decoupled weight decay."""
    st = opts.solver_type
    dtype = g.dtype

    if st == SolverType.GRADIENT_DESCENT:
        if isinstance(state, BBState):
            # BB rate with the shared rejection backoff (below): the BB
            # rule can overshoot on non-convex stretches, and backoff
            # turns those rejections into geometric backtracking.
            backoff = dtype.type(opts.lm.bad_factor) / lm_state.bad_factor
            return -state.lr * backoff * g, state
        return -dtype.type(opts.gd.lr) * g, state

    # Rejection backoff shared by every stateful method: a fixed-lr
    # proposal is deterministic, so a rejected step would otherwise be
    # re-proposed verbatim forever (livelock under max_consec_failures=0).
    # bad_factor doubles per consecutive rejection and resets on
    # acceptance (solvers/lm.py), giving lr, lr/2, lr/4, … backtracking.
    backoff = dtype.type(opts.lm.bad_factor) / lm_state.bad_factor

    if st == SolverType.SGD:
        mu = dtype.type(opts.sgd.momentum)
        v = mu * state.v + g
        step_g = g + mu * v if opts.sgd.nesterov else v
        return -dtype.type(opts.sgd.lr) * backoff * step_g, SGDState(v=v)

    if st in (SolverType.ADAM, SolverType.ADAMW):
        o = opts.adam
        b1, b2 = dtype.type(o.beta1), dtype.type(o.beta2)
        t = state.t + 1
        m = b1 * state.m + (1 - b1) * g
        v = b2 * state.v + (1 - b2) * g * g
        tf = t.astype(dtype)
        mhat = m / (1 - b1 ** tf)
        vhat = v / (1 - b2 ** tf)
        upd = mhat / (jnp.sqrt(vhat) + dtype.type(o.eps))
        if st == SolverType.ADAMW and o.weight_decay > 0:
            # Decoupled decay (Loshchilov & Hutter): x ← x − lr(upd + wd·x).
            # DELIBERATE DEVIATION (like the t-advance above): the decay
            # term is inside the rejection backoff, so consecutive
            # rejections shrink the effective decay of the eventually
            # accepted step along with the gradient step.  Scaling the
            # WHOLE proposal is what keeps backtracking sound — a
            # full-strength wd·x on a halved gradient step could exceed
            # the rejected proposal's cost increase and livelock the
            # accept/reject loop the backoff exists to break.
            upd = upd + dtype.type(o.weight_decay) * x_flat
        return -dtype.type(o.lr) * backoff * upd, AdamState(m=m, v=v, t=t)

    if st == SolverType.LBFGS:
        # (x_prev, g_prev) bookkeeping lives in fo_on_build (rebuild-gated
        # by the loop); the proposal itself is stateless.
        r = _lbfgs_direction(state, g)
        dx = -dtype.type(opts.lbfgs.lr) * backoff * r
        return dx, state

    raise ValueError(f"not a first-order solver type: {st}")
