"""Fused Pallas kernels for the deepsets/attn policy net (fwd + custom bwd).

Why this exists: the measured attn PPO update is device-bound ~10-15x off
roofline (docs/PERF.md round-4 "where the attn update's time actually
goes") because the set encoder's (rows, P, hp) intermediates round-trip
HBM at every matmul boundary, and the remat'd backward re-runs that chain
3.6x. These kernels keep one block of rows' ENTIRE forward (and backward)
in VMEM: the only HBM traffic is the obs rows in, logits/value out, and
in the backward the parameter gradients accumulated across grid steps.

Numerics mirror policies/net.py apply_net (same bf16 cast points, f32
accumulation, tanh gelu) but are not bit-identical to the XLA lowering —
this is a learned-policy training lever, not game semantics; CLAUDE.md
invariant 2 (splitmix determinism) is untouched. tests/test_fused_net.py
pins fwd/grad closeness against apply_net + jax.grad on CPU (interpret
mode); utils/ab_fused.py measures the TPU win.

Reference parity note: the reference has no learned policies at all (its
bots are LLM calls, /root/reference/agent/game_agent_v2.py:468-617); this
file is TPU-native surface with no reference counterpart.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from game_engine_tpu.gamespec.tables import Lowered
from game_engine_tpu.policies import net as N

# Rows (flattened time*room*viewer samples) per grid step. 128 keeps the
# backward's ~20 live (BR*P, hp) f32 intermediates near 10 MB of VMEM;
# the phi-stage matmuls still see BR*P=1024 rows on the MXU.
BLOCK_ROWS = 128

# The backward's recompute+grad stack overflows the compiler's default
# 16 MB scoped-vmem budget at hidden>=128 (measured on v5e: 17.61 MB at
# hidden=128, BR=128). v5e has 128 MB VMEM/core; give the kernels room.
VMEM_LIMIT = 100 * 1024 * 1024

_SQRT2OPI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _gelu(x):
    # tanh gelu, identical formula to jax.nn.gelu(approximate=True)
    u = _SQRT2OPI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _dgelu(x):
    u = _SQRT2OPI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT2OPI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


@dataclasses.dataclass(frozen=True)
class Dims:
    """Static shape config for one (lowered game, net config) pair."""

    P: int          # seats
    F0: int         # per-target feature width
    NP: int         # phase count (one-hot width in globals)
    hp: int         # encoder width
    hidden: int     # trunk width
    layers: int     # trunk depth
    n_opt: int      # option-head width
    A: int          # unified action width = max(P, n_opt)
    has_attn: bool
    br: int = BLOCK_ROWS  # rows per grid step (see BLOCK_ROWS)

    @property
    def G(self) -> int:  # viewer one-hot + phase one-hot + alive fraction
        return self.P + self.NP + 1

    @property
    def F(self) -> int:
        return self.P * self.F0 + self.G

    @property
    def trunk_in(self) -> int:
        return 2 * self.hp + self.NP + 1


def dims_for(lowered: Lowered, cfg: N.NetConfig,
             block_rows: int = BLOCK_ROWS) -> Dims:
    hp = max(32, cfg.hidden // 2)
    n_opt = max(1, int(lowered.choice_max.max()))
    return Dims(
        P=lowered.P,
        F0=N._per_player_dim(lowered),
        NP=lowered.NP,
        hp=hp,
        hidden=cfg.hidden,
        layers=cfg.layers,
        n_opt=n_opt,
        A=max(lowered.P, n_opt),
        has_attn=cfg.arch == "attn",
        br=block_rows,
    )


def supports(lowered: Lowered, cfg: N.NetConfig) -> bool:
    """The kernels cover the shipped deepsets/attn shapes: one attention
    head (the measured-fastest config, see NetConfig.attn_heads) and the
    standard param layout."""
    return cfg.arch in ("deepsets", "attn") and cfg.attn_heads == 1


def _interpret() -> bool:
    # tests force the CPU platform (conftest); interpret mode makes the
    # kernels runnable there so parity tests don't need a TPU
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# parameter marshalling: dict pytree -> flat tuple in a fixed order
# ---------------------------------------------------------------------------

def _param_names(d: Dims) -> list[str]:
    names = ["w_phi0", "b_phi0", "w_phi1", "b_phi1"]
    if d.has_attn:
        names += ["ln_s", "ln_b", "w_qkv", "w_ao"]
    names += ["w_ptr"]
    for i in range(d.layers):
        names += [f"w{i}", f"b{i}"]
    names += ["w_pi", "b_pi", "w_v", "b_v"]
    return names


def _pack_params(params: dict[str, Any], d: Dims) -> tuple:
    out = []
    for name in _param_names(d):
        p = params[name]
        if p.ndim == 1:  # biases / LN vectors -> (1, n) rows for VMEM blocks
            p = p.reshape(1, -1)
        out.append(p.astype(jnp.float32))
    return tuple(out)


# ---------------------------------------------------------------------------
# shared forward body (runs inside both kernels)
# ---------------------------------------------------------------------------

def _fwd_body(d: Dims, room, rest, pr: dict[str, Any], keep: bool):
    """Forward for one block. room (P, R, F0) bf16 SEAT-MAJOR, rest (R, G)
    bf16 row-major.

    Everything per-seat lives as P-long python lists of (R, ...) arrays or
    as seat-major (P*R, ...) stacks: Mosaic rejects lane-dim concats of
    single-lane pieces, but leading-dim indexing, sublane-axis concats, and
    iota+where lane scatter all lower cleanly (probed on hardware).

    Returns (logits (R, A) f32, value (R, 1) f32, saved) where saved holds
    the intermediates the backward needs when keep=True.
    """
    R = rest.shape[0]
    P, hp = d.P, d.hp
    f32, bf16 = jnp.float32, jnp.bfloat16
    sv: dict[str, Any] = {}

    def bdot(x, w):
        return jnp.dot(x.astype(bf16), w.astype(bf16),
                       preferred_element_type=f32)

    room2 = room.reshape(P * R, d.F0)                     # seat-major rows
    z0 = bdot(room2, pr["w_phi0"]) + pr["b_phi0"]         # (PR, hp) f32
    p0 = _gelu(z0)
    z1 = bdot(p0, pr["w_phi1"]) + pr["b_phi1"]
    e = _gelu(z1)
    eb = e.astype(bf16)                                   # phi pre-attn
    if keep:
        sv["z0"], sv["p0"], sv["z1"] = z0, p0, z1

    if d.has_attn:
        h = eb.astype(f32)
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-5)
        hn = (h - mu) * inv
        hb = (hn * pr["ln_s"] + pr["ln_b"]).astype(bf16)
        qkv = bdot(hb, pr["w_qkv"])                        # (PR, 3hp) f32
        qkv3 = qkv.reshape(P, R, 3 * hp)
        q3 = qkv3[:, :, :hp]                               # (P, R, hp)
        k3 = qkv3[:, :, hp:2 * hp]
        w3 = qkv3[:, :, 2 * hp:]
        scale = 1.0 / math.sqrt(hp)
        # seat-LEADING attention: every op below is a full-lane (P, R) or
        # (P, R, hp) tile. The previous emission kept P x P (R, 1) score
        # scalars-per-row — 36 ops/query-block at 1/128 lane utilization,
        # the dominant VPU cost of the kernel at small P (docs/PERF.md r5)
        att, o_rows = [], []
        for i in range(P):
            s_i = jnp.sum(q3[i][None] * k3, axis=-1) * scale   # (P, R)
            # softmax stats via (1, R) row slices: Mosaic rejects the
            # axis-0 keepdims reduce's replicated layout at the broadcast
            m = s_i[0:1]
            for j in range(1, P):
                m = jnp.maximum(m, s_i[j:j + 1])
            ex = jnp.exp(s_i - m)
            den = ex[0:1]
            for j in range(1, P):
                den = den + ex[j:j + 1]
            a_i = ex / den                                 # (P, R) f32
            ab = a_i.astype(bf16).astype(f32)              # net's bf16 att
            o_i = jnp.sum(ab[:, :, None] * w3, axis=0)     # (R, hp)
            att.append(a_i)
            o_rows.append(o_i)
        o2 = jnp.concatenate(o_rows, axis=0)               # (PR, hp)
        aog = bdot(o2, pr["w_ao"])                         # (PR, hp) f32
        phib = (e + aog).astype(bf16)
        if keep:
            sv.update(hn=hn, inv=inv, hb=hb, q3=q3, k3=k3, w3=w3,
                      att=att, o2=o2)
    else:
        phib = eb
    phi32 = phib.astype(f32)
    phi3 = phi32.reshape(P, R, hp)
    phi = [phi3[i] for i in range(P)]                      # each (R, hp)

    pooled = phi[0]
    for p in range(1, P):
        pooled = pooled + phi[p]
    pooled = pooled * (1.0 / P)                            # (R, hp)
    viewer = rest[:, :P].astype(f32)
    self_phi = viewer[:, 0:1] * phi[0]
    for p in range(1, P):
        self_phi = self_phi + viewer[:, p:p + 1] * phi[p]
    g32 = rest[:, P:].astype(f32)                          # (R, NP+1)
    t_in = jnp.concatenate([pooled, self_phi, g32], axis=-1)

    xs = [t_in]
    zs = []
    x = t_in
    for i in range(d.layers):
        z = bdot(x, pr[f"w{i}"]) + pr[f"b{i}"]
        x = _gelu(z)
        zs.append(z)
        xs.append(x)
    opt = bdot(x, pr["w_pi"]) + pr["b_pi"]                 # (R, n_opt)
    g = bdot(x, pr["w_ptr"])                               # (R, hp)
    gb = g.astype(bf16).astype(f32)
    gb16 = g.astype(bf16)
    # net multiplies ptr*g in bf16 then sum-accumulates f32; match the
    # product rounding so fused/XLA logits stay close on near-zero lanes.
    # scatter each seat's (R, 1) score into its lane with iota+where (lane
    # concat of 1-wide pieces is unsupported in Mosaic)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, d.A), 1)
    if d.n_opt == d.A:
        logits = opt
    else:
        logits = jnp.zeros((R, d.A), f32)
        for c in range(d.n_opt):
            logits = logits + jnp.where(lane == c, opt[:, c:c + 1], 0.0)
    for i in range(P):
        s_i = jnp.sum((phi[i].astype(bf16) * gb16).astype(f32),
                      axis=-1, keepdims=True)              # (R, 1)
        logits = logits + jnp.where(lane == i, s_i, 0.0)
    value = bdot(x, pr["w_v"]) + pr["b_v"]                 # (R, 1)
    if keep:
        sv.update(phi=phi, viewer=viewer, xs=xs, zs=zs, gb=gb)
    return logits, value, sv


def _named(d: Dims, refs) -> dict[str, Any]:
    return {n: r[:] for n, r in zip(_param_names(d), refs)}


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(d: Dims, room_ref, rest_ref, *rest_args):
    n = len(_param_names(d))
    param_refs, (logits_ref, value_ref) = rest_args[:n], rest_args[n:]
    pr = _named(d, param_refs)
    logits, value, _ = _fwd_body(d, room_ref[:], rest_ref[:], pr, keep=False)
    logits_ref[:] = logits
    value_ref[:] = value


def _run_fwd(d: Dims, room, rest, packed):
    n_rows = rest.shape[0]
    grid = (n_rows // d.br,)
    R = d.br
    pspecs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    logits, value = pl.pallas_call(
        functools.partial(_fwd_kernel, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d.P, R, d.F0), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d.G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *pspecs,
        ],
        out_specs=[
            pl.BlockSpec((R, d.A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, d.A), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(room, rest, *packed)
    return logits, value


# ---------------------------------------------------------------------------
# backward kernel: recompute fwd per block, accumulate param grads
# ---------------------------------------------------------------------------

def _grad_body(d: Dims, room, dl, dv, pr: dict[str, Any],
               sv: dict[str, Any]) -> dict[str, Any]:
    """Parameter gradients for one block given the loss cotangents dl
    (R, A) and dv (R, 1) and the saved forward intermediates sv. Shared
    by the plain backward kernel and the monolithic loss-grad kernel."""
    R, P, hp = dl.shape[0], d.P, d.hp
    f32, bf16 = jnp.float32, jnp.bfloat16

    def tdot(a, b):  # (R, m)^T (R, n) -> (m, n) param-grad contraction
        return jax.lax.dot_general(
            a.astype(f32), b.astype(f32), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def rsum(x):  # row-sum -> (1, n) bias grad
        return jnp.sum(x, axis=0, keepdims=True)

    g: dict[str, Any] = {}
    d_opt = dl[:, :d.n_opt]
    phi, gb, xs, zs = sv["phi"], sv["gb"], sv["xs"], sv["zs"]
    x_last = xs[-1]

    # heads: scores_i = phi_i . g  and the option/value linears
    d_g = dl[:, 0:1] * phi[0]
    dphi = [dl[:, i:i + 1] * gb for i in range(P)]
    for i in range(1, P):
        d_g = d_g + dl[:, i:i + 1] * phi[i]
    g["w_ptr"] = tdot(x_last, d_g)
    g["w_pi"] = tdot(x_last, d_opt)
    g["b_pi"] = rsum(d_opt)
    g["w_v"] = tdot(x_last, dv)
    g["b_v"] = rsum(dv)
    dx = (jnp.dot(d_g, pr["w_ptr"].T, preferred_element_type=f32)
          + jnp.dot(d_opt, pr["w_pi"].T, preferred_element_type=f32)
          + jnp.dot(dv, pr["w_v"].T, preferred_element_type=f32))

    # trunk
    for i in range(d.layers - 1, -1, -1):
        dz = dx * _dgelu(zs[i])
        g[f"w{i}"] = tdot(xs[i], dz)
        g[f"b{i}"] = rsum(dz)
        dx = jnp.dot(dz, pr[f"w{i}"].T, preferred_element_type=f32)

    d_pooled = dx[:, :hp] * (1.0 / P)
    d_self = dx[:, hp:2 * hp]
    viewer = sv["viewer"]
    for p in range(P):
        dphi[p] = dphi[p] + d_pooled + viewer[:, p:p + 1] * d_self
    d_phi2 = jnp.concatenate(dphi, axis=0)                 # (PR, hp)

    if d.has_attn:
        # residual: phi = e + (o2 @ w_ao)
        o2 = sv["o2"]
        g["w_ao"] = tdot(o2, d_phi2)
        d_o2 = jnp.dot(d_phi2, pr["w_ao"].T, preferred_element_type=f32)
        d_o3 = d_o2.reshape(P, R, hp)
        q3, k3, w3, att = sv["q3"], sv["k3"], sv["w3"], sv["att"]
        scale = 1.0 / math.sqrt(hp)
        # seat-leading, mirroring the forward: (P, R) / (P, R, hp) tiles
        dq_rows = []
        dk3 = jnp.zeros((P, R, hp), f32)
        dw3 = jnp.zeros((P, R, hp), f32)
        for i in range(P):
            d_oi = d_o3[i]                                 # (R, hp)
            a_i = att[i]                                   # (P, R) f32
            d_a = jnp.sum(d_oi[None] * w3, axis=-1)        # (P, R)
            # the net mixes with the bf16-rounded att value
            ab_i = a_i.astype(bf16).astype(f32)
            dw3 = dw3 + ab_i[:, :, None] * d_oi[None]
            ad = a_i * d_a
            inner = ad[0:1]                                # (1, R)
            for j in range(1, P):
                inner = inner + ad[j:j + 1]
            d_s = a_i * (d_a - inner)                      # softmax bwd
            dq_i = jnp.sum(d_s[:, :, None] * k3, axis=0)   # (R, hp)
            dk3 = dk3 + d_s[:, :, None] * q3[i][None]
            dq_rows.append(dq_i * scale)
        dk3 = dk3 * scale
        d_qkv = jnp.concatenate(
            [jnp.concatenate(dq_rows, axis=0),
             dk3.reshape(P * R, hp),
             dw3.reshape(P * R, hp)], axis=-1)             # (PR, 3hp)
        g["w_qkv"] = tdot(sv["hb"], d_qkv)
        d_h = jnp.dot(d_qkv, pr["w_qkv"].T, preferred_element_type=f32)
        hn = sv["hn"]
        g["ln_s"] = rsum(d_h * hn)
        g["ln_b"] = rsum(d_h)
        d_hn = d_h * pr["ln_s"]
        m1 = jnp.mean(d_hn, axis=-1, keepdims=True)
        m2 = jnp.mean(d_hn * hn, axis=-1, keepdims=True)
        d_e = d_phi2 + sv["inv"] * (d_hn - m1 - hn * m2)
    else:
        d_e = d_phi2

    dz1 = d_e * _dgelu(sv["z1"])
    g["w_phi1"] = tdot(sv["p0"], dz1)
    g["b_phi1"] = rsum(dz1)
    dp0 = jnp.dot(dz1, pr["w_phi1"].T, preferred_element_type=f32)
    dz0 = dp0 * _dgelu(sv["z0"])
    g["w_phi0"] = tdot(room.reshape(P * R, d.F0).astype(f32), dz0)
    g["b_phi0"] = rsum(dz0)
    return g


def _accumulate(names, grad_refs, g) -> None:
    step = pl.program_id(0)
    for name, ref in zip(names, grad_refs):
        @pl.when(step == 0)
        def _init(ref=ref, name=name):
            ref[:] = g[name]

        @pl.when(step != 0)
        def _acc(ref=ref, name=name):
            ref[:] = ref[:] + g[name]


def _bwd_kernel(d: Dims, room_ref, rest_ref, dl_ref, dv_ref, *rest_args):
    names = _param_names(d)
    n = len(names)
    param_refs, grad_refs = rest_args[:n], rest_args[n:]
    pr = _named(d, param_refs)
    room = room_ref[:]                                    # (P, R, F0)
    _, _, sv = _fwd_body(d, room, rest_ref[:], pr, keep=True)
    g = _grad_body(d, room, dl_ref[:], dv_ref[:], pr, sv)
    _accumulate(names, grad_refs, g)


def _run_bwd(d: Dims, room, rest, dl, dv, packed):
    n_rows = rest.shape[0]
    grid = (n_rows // d.br,)
    R = d.br
    pspecs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    gspecs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    gshapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in packed]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d.P, R, d.F0), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d.G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d.A), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *pspecs,
        ],
        out_specs=gspecs,
        out_shape=gshapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(room, rest, dl, dv, *packed)


# ---------------------------------------------------------------------------
# monolithic PPO loss-grad kernel: fwd + in-kernel loss cotangents + bwd in
# ONE pass over the row stream
# ---------------------------------------------------------------------------
#
# value_and_grad over the fwd/bwd kernel pair runs the forward TWICE: once
# standalone (to produce logits for the XLA-side loss) and once inside the
# backward's recompute. ab_fused2/ab_fused3 (docs/PERF.md round 5) show the
# kernels ARE the whole cost of the fused loss grad, so that standalone
# forward is ~45% pure redundancy. This kernel computes the clipped-PPO
# loss cotangents dl/dv in VMEM from the recomputed forward — the PPO loss
# is row-local once the masked-advantage normalization and denominators
# are precomputed outside — and feeds them straight into _grad_body.

N_STATS = 4  # per-block [sum pg*m, sum 0.5*(v-ret)^2*valid, sum ent*m, sum ratio*m]


def _lossgrad_kernel(d: Dims, clip_eps: float, ent_coef: float,
                     room_ref, rest_ref, legal_ref, aoh_ref, logp_ref,
                     advn_ref, ret_ref, wrow_ref, vrow_ref, *rest_args):
    names = _param_names(d)
    n = len(names)
    param_refs = rest_args[:n]
    grad_refs, stats_ref = rest_args[n:n + n], rest_args[n + n]
    pr = _named(d, param_refs)
    f32 = jnp.float32
    room = room_ref[:]                                    # (P, R, F0)
    logits, value, sv = _fwd_body(d, room, rest_ref[:], pr, keep=True)
    R, A = logits.shape

    legal = legal_ref[:]                                  # (R, A) 1/0 f32
    logits_m = jnp.where(legal > 0, logits, jnp.float32(-1e9))
    mx = jnp.max(logits_m, axis=-1, keepdims=True)
    ex = jnp.exp(logits_m - mx)
    sumex = jnp.sum(ex, axis=-1, keepdims=True)
    logp_all = logits_m - (mx + jnp.log(sumex))           # (R, A)
    p = ex / sumex
    aoh = aoh_ref[:]                                      # (R, A) one-hot
    logp = jnp.sum(logp_all * aoh, axis=-1, keepdims=True)
    ratio = jnp.exp(logp - logp_ref[:])                   # (R, 1)
    adv = advn_ref[:]                                     # pre-normalized
    u1 = ratio * adv
    u2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    pg = -jnp.minimum(u1, u2)
    # d pg / d logp — matches lax.min's tie rule: inside the clip band
    # u1 == u2 and both subgradients are adv*ratio, so the 0.5/0.5 split
    # equals the single-branch value
    inband = (ratio >= 1.0 - clip_eps) & (ratio <= 1.0 + clip_eps)
    flows = (u1 <= u2) | inband
    dpg_dlogp = -adv * ratio * jnp.where(flows, 1.0, 0.0)

    ent = -jnp.sum(p * logp_all, axis=-1, keepdims=True)  # (R, 1)
    wrow = wrow_ref[:]                                    # mask/msum (R, 1)
    vrow = vrow_ref[:]                                    # vf*valid/n (R, 1)
    ret = ret_ref[:]
    # loss = pg_loss + vf*v_loss + ent_coef*(-entropy); all row-local
    dl = wrow * (dpg_dlogp * (aoh - p)
                 + ent_coef * p * (logp_all + ent))
    dl = dl * legal                                       # -1e9 lanes: no grad
    dv = vrow * (value - ret)

    g = _grad_body(d, room, dl, dv, pr, sv)
    _accumulate(names, grad_refs, g)

    # loss/metric sums: scatter the (R, 1) pieces into (R, 128) lanes,
    # ones(1,R) @ (R,128) on the MXU (no axis-0 VPU reduce — Mosaic
    # rejects its replicated layout), then accumulate into a fixed
    # (8, 128) block across grid steps like the param grads.
    # wrow/vrow already carry the 1/msum, vf/n scalings, so the summed
    # stats ARE pg_loss, vf*v_loss, entropy, ratio_mean
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    z = (jnp.where(lane == 0, pg * wrow, 0.0)
         + jnp.where(lane == 1, 0.5 * (value - ret) ** 2 * vrow, 0.0)
         + jnp.where(lane == 2, ent * wrow, 0.0)
         + jnp.where(lane == 3, ratio * wrow, 0.0))
    s1 = jnp.dot(jnp.ones((1, R), f32), z,
                 preferred_element_type=f32)               # (1, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    s8 = jnp.where(row == 0, s1, 0.0)                      # (8, 128)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _sinit():
        stats_ref[:] = s8

    @pl.when(step != 0)
    def _sacc():
        stats_ref[:] = stats_ref[:] + s8


def _run_lossgrad(d: Dims, clip_eps, ent_coef, room, rest, legal, aoh,
                  logp_old, advn, ret, wrow, vrow, packed):
    n_rows = rest.shape[0]
    grid = (n_rows // d.br,)
    R = d.br
    A = legal.shape[-1]
    pspecs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    gspecs = [
        pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for p in packed
    ]
    gshapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in packed]

    def row1(i):
        return (i, 0)

    outs = pl.pallas_call(
        functools.partial(_lossgrad_kernel, d, clip_eps, ent_coef),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d.P, R, d.F0), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d.G), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, A), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, A), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row1, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row1, memory_space=pltpu.VMEM),
            *pspecs,
        ],
        out_specs=[
            *gspecs,
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            *gshapes,
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(room, rest, legal, aoh, logp_old, advn, ret, wrow, vrow, *packed)
    return outs[:-1], outs[-1]


def make_loss_vg(lowered: Lowered, cfg: N.NetConfig, clip_eps: float,
                 vf_coef: float, ent_coef: float,
                 block_rows: int = BLOCK_ROWS):
    """(params, obs, legal, actions, logp_old, adv, ret, mask) ->
    ((loss, metrics), grads) — the fused train path's replacement for
    jax.value_and_grad(ppo_loss): ONE kernel pass instead of a standalone
    forward plus a recomputing backward. Numerics mirror train.ppo
    .ppo_loss (masked-advantage normalization, legal masking, clip/tie
    rules); tests/test_fused_net.py pins loss/metric/grad closeness."""
    if not supports(lowered, cfg):
        raise ValueError("fused kernels cover deepsets/attn with 1 head")
    d = dims_for(lowered, cfg, block_rows)

    def loss_vg(params, obs, legal, actions, logp_old, adv, ret, mask):
        f32 = jnp.float32
        lead = obs.shape[:-1]
        n = int(np.prod(lead))
        A = legal.shape[-1]
        m = mask.astype(f32).reshape(n, 1)
        msum = jnp.maximum(jnp.sum(m), 1.0)
        advf = adv.astype(f32).reshape(n, 1)
        mean = jnp.sum(advf * m) / msum
        std = jnp.sqrt(jnp.sum(m * (advf - mean) ** 2) / msum) + 1e-8
        advn = (advf - mean) / std
        a_idx = jnp.clip(actions.reshape(n) - 1, 0, A - 1)
        aoh = jax.nn.one_hot(a_idx, A, dtype=f32)

        rows = obs.reshape(n, d.F).astype(jnp.bfloat16)
        n_pad = -(-n // d.br) * d.br

        def pad(x):
            return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))

        rows = pad(rows)
        room = rows[:, :d.P * d.F0].reshape(
            n_pad, d.P, d.F0).transpose(1, 0, 2)
        rest = rows[:, d.P * d.F0:]
        legal_f = pad(legal.reshape(n, A).astype(f32))
        aoh = pad(aoh)
        logp_f = pad(logp_old.astype(f32).reshape(n, 1))
        advn = pad(advn)
        ret_f = pad(ret.astype(f32).reshape(n, 1))
        wrow = pad(m / msum)                       # 0 on padded rows
        vrow = pad(jnp.full((n, 1), vf_coef / n, f32))
        packed = _pack_params(params, d)
        grads_t, stats = _run_lossgrad(
            d, clip_eps, ent_coef, room, rest, legal_f, aoh, logp_f,
            advn, ret_f, wrow, vrow, packed)
        s = stats[0]  # row 0 of the accumulated (8, 128) block
        pg_loss, v_loss, entropy, ratio_mean = s[0], s[1], s[2], s[3]
        loss = pg_loss + v_loss - ent_coef * entropy
        metrics = {"pg_loss": pg_loss, "v_loss": v_loss / vf_coef,
                   "entropy": entropy, "ratio_mean": ratio_mean}
        grads = {name: gt.reshape(params[name].shape)
                 for name, gt in zip(_param_names(d), grads_t)}
        return (loss, metrics), grads

    return loss_vg


# ---------------------------------------------------------------------------
# public entry: apply_net-compatible callable with a custom VJP
# ---------------------------------------------------------------------------

def make_apply(lowered: Lowered, cfg: N.NetConfig,
               block_rows: int = BLOCK_ROWS):
    """Build fused (params, obs) -> (logits, value), drop-in for
    N.apply_net on the deepsets/attn archs. obs may have any leading dims;
    gradients flow to params only (obs is rollout data in every caller)."""
    if not supports(lowered, cfg):
        raise ValueError("fused kernels cover deepsets/attn with 1 head")
    d = dims_for(lowered, cfg, block_rows)

    @jax.custom_vjp
    def core(packed, room, rest):
        return _run_fwd(d, room, rest, packed)

    def core_fwd(packed, room, rest):
        return _run_fwd(d, room, rest, packed), (packed, room, rest)

    def core_bwd(res, cts):
        packed, room, rest = res
        dl, dv = cts
        grads = _run_bwd(d, room, rest, dl, dv, packed)
        return (tuple(grads), jnp.zeros_like(room), jnp.zeros_like(rest))

    core.defvjp(core_fwd, core_bwd)

    def apply(params, obs):
        lead = obs.shape[:-1]
        assert obs.shape[-1] == d.F, (obs.shape, d)
        n = int(np.prod(lead)) if lead else 1
        rows = obs.reshape(n, d.F).astype(jnp.bfloat16)
        n_pad = -(-n // d.br) * d.br
        if n_pad != n:
            rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
        # seat-major (P, rows, F0): the kernels index seats on the leading
        # dim (lane-dim concat of per-seat pieces doesn't lower in Mosaic)
        room = rows[:, :d.P * d.F0].reshape(n_pad, d.P, d.F0).transpose(1, 0, 2)
        rest = rows[:, d.P * d.F0:]
        packed = _pack_params(params, d)
        logits, value = core(packed, room, rest)
        logits = logits[:n].reshape(lead + (d.A,))
        value = value[:n, 0].reshape(lead)
        return logits, value

    # grads must flow dict->tuple->dict: pack is differentiable (astype /
    # reshape), so jax.grad through apply lands on the original params dict
    return apply
