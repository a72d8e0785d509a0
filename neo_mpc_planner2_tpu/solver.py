"""Batched proximal solver — the device replacement for scipy SLSQP.

The reference solves a 3·control_steps-variable problem per tick with scipy
SLSQP + finite-difference gradients (mpc_optimization_server.py:363-364), with
per-variable box bounds (py:125-133) and a per-step translational-speed cone
constraint max_vel_trans ≥ ‖(vx, vy)‖ (py:157-158, :134). The objective splits
as F(u) = f(u) + g(u):

- f: the smooth terms (tracking, costmap, footprint, terminal) with analytic
  gradients via jax.grad — one fused XLA evaluation vs SLSQP's 3N+1 objective
  sweeps per finite-difference gradient;
- g: the nonsmooth control-effort term λ·Σ‖u_i − v‖ (py:253-254) PLUS the
  indicator of the feasible set. g gets a proximal operator: block
  soft-threshold toward the current velocity composed with an exact Dykstra
  projection onto box ∩ speed-disk. (The two nonsmooth pieces are essentially
  never active simultaneously — the kink sits at the feasible *interior* point
  u_i = v — so the composition is the exact prox in both regimes that occur.)

The outer loop is monotone prox-FISTA with backtracking line search and
function-value adaptive restart under `lax.while_loop`, stopping SLSQP-style
when a productive iteration improves F by less than ftol. Everything is pure
and static-shaped: `vmap` batches thousands of scenarios, `pjit` shards them
over a mesh.

The returned `converged` flag mirrors scipy's `x.success`, which the
warm-start logic branches on (py:397-400).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .config import MpcConfig

__all__ = ["SolveResult", "project_feasible", "prox_g", "prox_fista", "make_solver"]


class SolveResult(NamedTuple):
    x: jnp.ndarray          # (3N,) solution
    fun: jnp.ndarray        # () final total objective F = f + g_ctrl
    converged: jnp.ndarray  # () bool — ftol reached before max_iters
    iters: jnp.ndarray      # () int32


def _project_box(v, lo, hi):
    return jnp.clip(v, lo, hi)


def _project_disk(xy, radius):
    """Project (..., 2) onto the origin-centered disk of given radius."""
    norm = jnp.sqrt(jnp.sum(xy**2, axis=-1, keepdims=True))
    scale = jnp.where(norm > radius, radius / jnp.maximum(norm, 1e-30), 1.0)
    return xy * scale


def _project_box_disk(xy: jnp.ndarray, lo, hi, r) -> jnp.ndarray:
    """EXACT projection of (N, 2) points onto box([lo, hi]) ∩ disk(r), closed
    form (the set is 2-D so all cases enumerate):

    1. If the box-clipped point is inside the disk, it is the projection
       (it minimizes distance over the box ⊇ intersection and is feasible).
    2. Else if the disk-scaled point is inside the box, that is the projection.
    3. Else the projection lies where the circle crosses a box edge — pick the
       nearest feasible of the ≤8 circle–edge intersection candidates.
    """
    pb = _project_box(xy, lo, hi)
    pb_ok = jnp.sum(pb**2, axis=-1) <= r**2 + 1e-12

    pd = _project_disk(xy, r)
    eps = 1e-6
    pd_ok = jnp.all((pd >= lo - eps) & (pd <= hi + eps), axis=-1)

    # Circle ∩ edge-line candidates (8 per point, shared coordinates).
    def edge_pts(coord, axis):
        s = jnp.sqrt(jnp.maximum(r**2 - coord**2, 0.0))
        if axis == 0:
            return jnp.array([[coord, 0.0], [coord, 0.0]]) + jnp.array([[0.0, 1.0], [0.0, -1.0]]) * s
        return jnp.array([[0.0, coord], [0.0, coord]]) + jnp.array([[1.0, 0.0], [-1.0, 0.0]]) * s

    cands = jnp.concatenate(
        [edge_pts(lo[0], 0), edge_pts(hi[0], 0), edge_pts(lo[1], 1), edge_pts(hi[1], 1)],
        axis=0,
    )  # (8, 2)
    # A candidate is only valid if it lies on BOTH sets: when a box bound
    # exceeds the radius, edge_pts' sqrt(max(r² − coord², 0)) = 0 fabricates
    # (coord, 0) — a point OUTSIDE the disk that the box-only test accepted,
    # so the "projection" could violate the max_vel_trans cone (round-5
    # review, e.g. lo=(-1,-0.1), hi=(1,0.1), r=0.5, xy=(0.9,0.3) returned
    # (1,0) with speed 1.0). True circle–edge intersections satisfy the disk
    # test by construction, so this filter removes only the fabricated ones.
    feas = jnp.all((cands >= lo - eps) & (cands <= hi + eps), axis=-1)  # (8,)
    feas &= jnp.sum(cands**2, axis=-1) <= r**2 + 1e-6
    d2 = jnp.sum((xy[:, None, :] - cands[None, :, :]) ** 2, axis=-1)  # (N, 8)
    d2 = jnp.where(feas[None, :], d2, jnp.inf)
    best = cands[jnp.argmin(d2, axis=-1)]  # (N, 2)

    return jnp.where(pb_ok[:, None], pb, jnp.where(pd_ok[:, None], pd, best))


def project_feasible(u_flat: jnp.ndarray, cfg: MpcConfig,
                     limits=None) -> jnp.ndarray:
    """Exact projection onto the per-step feasible set
    [min_vel_x,max_vel_x]×[min_vel_y,max_vel_y]×[min_vel_theta,max_vel_theta]
    ∩ {‖(vx,vy)‖ ≤ max_vel_trans}: closed form (theta clamp + exact 2-D
    box∩disk projection). `limits`: optional runtime Limits pytree overriding
    the static config bounds (retrace-free reconfigure)."""
    n = cfg.control_steps
    u = u_flat.reshape(n, 3)
    if limits is None:
        lo = jnp.array([cfg.min_vel_x, cfg.min_vel_y], u.dtype)
        hi = jnp.array([cfg.max_vel_x, cfg.max_vel_y], u.dtype)
        r = jnp.asarray(cfg.max_vel_trans, u.dtype)
        theta = jnp.clip(u[:, 2], cfg.min_vel_theta, cfg.max_vel_theta)
    else:
        lo = jnp.asarray(limits.vel_lo[:2], u.dtype)
        hi = jnp.asarray(limits.vel_hi[:2], u.dtype)
        r = jnp.asarray(limits.max_vel_trans, u.dtype)
        theta = jnp.clip(u[:, 2], limits.vel_lo[2], limits.vel_hi[2])
    xy = _project_box_disk(u[:, :2], lo, hi, r)
    return jnp.concatenate([xy, theta[:, None]], axis=1).reshape(-1)


def _soft_threshold_to(u: jnp.ndarray, v: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """prox of tau·Σ_i‖u_i − v‖: per-step block soft-threshold toward v.
    u: (N, 3), v: (3,)."""
    d = u - v[None, :]
    nrm = jnp.sqrt(jnp.sum(d**2, axis=-1, keepdims=True))
    scale = jnp.maximum(1.0 - tau / jnp.maximum(nrm, 1e-30), 0.0)
    return v[None, :] + scale * d


def prox_g(z_flat: jnp.ndarray, tau: jnp.ndarray, current_vel: jnp.ndarray,
           cfg: MpcConfig, limits=None) -> jnp.ndarray:
    """Exact prox of g(u) = tau·Σ_i‖u_i − v‖ + ind_box(u) + ind_disk(u_xy)
    via Dykstra-like proximal splitting (cyclic Dykstra generalizes from
    projections to proximity operators and converges to the prox of the sum).

    This handles the cases where the control-cost kink interacts with active
    bounds — e.g. a current velocity outside the speed disk — where a naive
    soft-threshold∘projection composition is inexact and stalls the outer loop.
    """
    n = cfg.control_steps
    z = z_flat.reshape(n, 3)

    def proj_set(u):
        return project_feasible(u.reshape(-1), cfg, limits).reshape(n, 3)

    def cycle(carry, _):
        x, p1, p2 = carry
        y1 = _soft_threshold_to(x + p1, current_vel, tau)
        p1 = x + p1 - y1
        y2 = proj_set(y1 + p2)
        p2 = y1 + p2 - y2
        return (y2, p1, p2), None

    zeros = jnp.zeros_like(z)
    (x, _, _), _ = jax.lax.scan(
        cycle, (z, zeros, zeros), None, length=cfg.projection_iters
    )
    return x.reshape(-1)


class _FistaState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray
    L: jnp.ndarray
    F_x: jnp.ndarray
    k: jnp.ndarray
    done: jnp.ndarray


def prox_fista(
    f_smooth: Callable[[jnp.ndarray], jnp.ndarray],
    g_ctrl: Callable[[jnp.ndarray], jnp.ndarray],
    ctrl_lambda: jnp.ndarray,
    current_vel: jnp.ndarray,
    x0: jnp.ndarray,
    cfg: MpcConfig,
    ftol: float | None = None,
    max_iters: int | None = None,
    L0: float = 1.0,
    limits=None,
) -> SolveResult:
    """Minimize F = f_smooth + g_ctrl over the feasible set from warm start x0.

    g_ctrl must equal ctrl_lambda·Σ_i‖u_i − current_vel‖ (evaluated for the
    objective value; its prox is applied in closed form).
    """
    ftol = cfg.opt_tolerance if ftol is None else ftol
    max_iters = cfg.solver_max_iters if max_iters is None else max_iters
    proj = partial(project_feasible, cfg=cfg, limits=limits)
    val_grad = jax.value_and_grad(f_smooth)
    eta = 2.0
    max_backtracks = 30

    def prox(z, L):
        return prox_g(z, ctrl_lambda / L, current_vel, cfg, limits)

    def F(u):
        return f_smooth(u) + g_ctrl(u)

    x0 = proj(x0)
    F0 = F(x0)

    def body(s: _FistaState) -> _FistaState:
        fy, gy = val_grad(s.y)

        # Backtracking on the smooth part: grow L until
        # f(p) ≤ f(y) + ⟨∇f(y), p−y⟩ + L/2‖p−y‖² at p = prox(y − ∇f/L, L).
        # Two lockstep-vmap rules (same fixes as the SQP line search,
        # PERF.md round 2): (1) gate on ~s.done — under vmap a DONE lane
        # still executes this inner loop and its (discarded) iterates can
        # demand the full backtrack budget, inflating every alive lane's
        # trip count; (2) carry f_smooth(p) so each trip evaluates the
        # objective once, not twice (cond re-eval). Neither changes any
        # lane's result — done-lane compute is select-discarded anyway.
        def bt_cond(c):
            L, p, fp, j = c
            d = p - s.y
            ub = fy + jnp.vdot(gy, d) + 0.5 * L * jnp.vdot(d, d)
            return (~s.done) & (fp > ub + 1e-12) & (j < max_backtracks)

        def bt_body(c):
            L, _, _, j = c
            Ln = L * eta
            pn = prox(s.y - gy / Ln, Ln)
            return (Ln, pn, f_smooth(pn), j + 1)

        p0 = prox(s.y - gy / s.L, s.L)
        L, p, fp, _ = jax.lax.while_loop(
            bt_cond, bt_body, (s.L, p0, f_smooth(p0), jnp.int32(0)))
        Fp = fp + g_ctrl(p)

        # Monotone variant + adaptive restart: reject steps that increase F.
        restart = Fp > s.F_x
        x_new = jnp.where(restart, s.x, p)
        F_new = jnp.where(restart, s.F_x, Fp)
        t_new = jnp.where(restart, 1.0, 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * s.t**2)))
        beta = jnp.where(restart, 0.0, (s.t - 1.0) / t_new)
        y_new = x_new + beta * (x_new - s.x)

        # Stop when a productive iteration improves F by < ftol (SLSQP-style;
        # restart iterations leave F unchanged and must not trigger it), or
        # when backtracking has driven the step size to numerical zero.
        done = ((~restart) & (jnp.abs(s.F_x - F_new) < ftol)) | (L > 1e8)
        return _FistaState(x=x_new, y=y_new, t=t_new, L=L * 0.9, F_x=F_new,
                           k=s.k + 1, done=done)

    def cond(s: _FistaState):
        return (~s.done) & (s.k < max_iters)

    init = _FistaState(
        x=x0, y=x0, t=jnp.asarray(1.0, x0.dtype), L=jnp.asarray(L0, x0.dtype),
        F_x=F0, k=jnp.int32(0), done=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    return SolveResult(x=final.x, fun=final.F_x, converged=final.done, iters=final.k)


def make_solver(cfg: MpcConfig, objective, ftol: float | None = None,
                max_iters: int | None = None):
    """objective: the callable from ops.objective.make_objective. Returns
    solve(x0, scenario) -> SolveResult.

    Splits the objective into smooth + prox parts and (in parity mode) hoists
    the decision-variable-independent footprint term out of the loop.
    """
    from .ops.objective import (control_cost, parity_footprint_term,
                                resolve_weights)

    parity = getattr(objective, "parity", True)
    # The prox split is only valid for the UNSQUARED control term (the
    # reference quirk, compat.unsquared_control_cost=True): the block
    # soft-threshold is the prox of tau·Σ‖u_i − v‖, NOT of the squared norm.
    # With the quirk off (smooth product objectives) the control term is
    # smooth — it belongs in the gradient path (include_control=True), and
    # the prox degenerates to the pure feasible-set projection (lam=0), per
    # CompatConfig's documented contract (round-5 review: the old
    # unconditional split applied a wrong prox to the squared term).
    prox_ctrl = cfg.compat.unsquared_control_cost

    def solve(x0, scen):
        fp_term = parity_footprint_term(scen, cfg) if parity else None
        # Per-scenario weight overrides (Weights.grid) must reach the prox
        # threshold too, not just the smooth terms (round-5 review: the
        # static cfg.w_control silently ignored the weights axis here).
        wc = resolve_weights(scen, cfg).w_control
        lam = (wc / cfg.control_steps) if prox_ctrl else 0.0
        sampler = None
        if (not parity and cfg.solver_costmap_patch > 0
                and scen.costmap.win_cells is None):
            # Same per-solve patch hoist as the SQP product path
            # (sqp._lane_fobj): FISTA's backtracking re-evaluates f_smooth
            # often, so the full-map bilinear/footprint reads dominate it
            # even harder. Values bit-identical inside the coverage
            # guarantee at solver_patch_exact_picks=True; backend-precision
            # picks otherwise (ProductPatchSampler).
            from .ops.costmap import ProductPatchSampler

            sampler = ProductPatchSampler(
                scen.costmap, scen.current_pose[0], scen.current_pose[1],
                cfg.solver_costmap_patch, exact=cfg.solver_patch_exact_picks)
        f_smooth = lambda u: objective(u, scen, fp_term,
                                       include_control=not prox_ctrl,
                                       point_sampler=sampler)
        if prox_ctrl:
            g_ctrl = lambda u: control_cost(u, scen.current_vel, cfg, wc)
        else:
            g_ctrl = lambda u: jnp.zeros(())
        return prox_fista(
            f_smooth, g_ctrl, lam, scen.current_vel, x0, cfg,
            ftol=ftol, max_iters=max_iters, limits=scen.limits,
        )

    return solve
