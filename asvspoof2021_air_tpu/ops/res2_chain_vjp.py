"""Custom-VJP train-mode Res2 hierarchical conv chain.

The ECAPA Bottle2neck's chain (models/ecapa.py:63-80, mirroring
/root/reference/ecapa_tdnn.py:64-83) is scale-1 = 7 SEQUENTIAL
width-64 convs, each followed by relu -> train-mode BatchNorm. The
train-step trace (docs/PERFORMANCE.md "Train-step roofline") puts the
chains at 2.6 ms fwd+bwd at 14-17% of MXU peak: 21 small kernels
forward, ~21 more backward (7 dgrads + 7 wgrads + BN backwards), each
a (B*T, 192) @ (192, 64) matmul that wastes half the MXU lanes.

This module keeps the forward sequential (the data dependency is real)
but reorganizes the BACKWARD:

  - all 7 weight gradients become ONE batched einsum; the per-conv
    inputs it needs are recomputed ELEMENTWISE from the saved pre-ReLU
    conv outputs (no conv recompute, unlike the measured-slower remat
    policies);
  - the BN/ReLU backward math is inlined into the reverse loop with the
    recompute trick of ops/bn_relu_vjp.py (residuals are only the
    pre-ReLU conv outputs + batch stats);
  - the data-gradient chain stays sequential but runs as shift+matmul.

Semantics are pinned against the standard autodiff path (forward
values, all gradients, BN batch stats) by tests/test_res2_chain_vjp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _shift(x, s):
    """y[t] = x[t - s] along axis -2, zero fill (zero-padded conv tap)."""
    if s == 0:
        return x
    T = x.shape[-2]
    if s > 0:
        return jnp.concatenate(
            [jnp.zeros_like(x[..., :s, :]), x[..., : T - s, :]], axis=-2)
    return jnp.concatenate(
        [x[..., -s:, :], jnp.zeros_like(x[..., :(-s), :])], axis=-2)


def _taps(sp, d):
    """(..., T, w) -> (..., T, 3w): the three dilated conv taps in
    nn.Conv kernel order (y[t] = x[t-d] K0 + x[t] K1 + x[t+d] K2)."""
    return jnp.concatenate([_shift(sp, d), sp, _shift(sp, -d)], axis=-1)


def _bn_fwd(y, scale, bias, eps):
    """flax-equivalent train BatchNorm of relu(y): f32 stats over (B,T)."""
    r = jax.nn.relu(y).astype(jnp.float32)
    mu = jnp.mean(r, axis=(0, 1))
    mu2 = jnp.mean(r * r, axis=(0, 1))
    var = jnp.maximum(0.0, mu2 - mu * mu)
    y32 = (r - mu) * (lax.rsqrt(var + eps) * scale) + bias
    return y32, mu, var


def _primal(x, W, CB, S, Bb, dilation, eps, want_ys=False):
    G = W.shape[0]
    C = x.shape[-1]
    w = C // (G + 1)
    dt = x.dtype
    Wd = W.astype(dt)
    CBd = CB.astype(dt)
    outs, ys, mus, vrs = [], [], [], []
    sp = None
    for i in range(G):
        g = x[..., i * w:(i + 1) * w]
        sp = g if i == 0 else (sp + g).astype(dt)
        x3 = _taps(sp, dilation)
        y = (jnp.einsum("btk,ko->bto", x3, Wd[i].reshape(3 * w, w))
             + CBd[i]).astype(dt)
        y32, mu, var = _bn_fwd(y, S[i], Bb[i], eps)
        z = y32.astype(dt)
        outs.append(z)
        mus.append(mu)
        vrs.append(var)
        if want_ys:
            ys.append(y)
        sp = z
    out = jnp.concatenate(outs + [x[..., G * w:]], axis=-1)
    return (out, jnp.stack(mus), jnp.stack(vrs),
            jnp.stack(ys) if want_ys else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def res2_chain_train(x, W, CB, S, Bb, dilation, eps):
    """Train-mode Res2 chain: x (B, T, C) post-1x1 activation ->
    (out (B, T, C), mus (G, w), vars (G, w)).

    W (G, 3, w, w) conv kernels (nn.Conv tap-major layout), CB (G, w)
    conv biases, S/Bb (G, w) BN scale/bias (all f32). Groups 0..G-1 are
    convolved, the last group passes through; matches the unfused loop
    in models/ecapa.py:63-80 exactly (same dtypes, same flax BN math).
    """
    out, mus, vrs, _ = _primal(x, W, CB, S, Bb, dilation, eps)
    return out, mus, vrs


def _fwd(x, W, CB, S, Bb, dilation, eps):
    out, mus, vrs, ys = _primal(x, W, CB, S, Bb, dilation, eps,
                                want_ys=True)
    return (out, mus, vrs), (x, W, S, Bb, ys, mus, vrs)


def _bwd(dilation, eps, res, cts):
    x, W, S, Bb, ys, mus, vrs = res
    g_out, g_mus, g_vrs = cts
    G = W.shape[0]
    B, T, C = x.shape
    w = C // (G + 1)
    n = B * T
    dt = x.dtype
    d = dilation

    # elementwise recompute: normalized outputs z_i and conv inputs
    rs, invs, xhats, sp_ins = [], [], [], []
    sp = None
    for i in range(G):
        g = x[..., i * w:(i + 1) * w]
        sp = g if i == 0 else (sp + g).astype(dt)
        sp_ins.append(sp)
        r = jax.nn.relu(ys[i]).astype(jnp.float32)
        inv = lax.rsqrt(vrs[i] + eps)
        xhat = (r - mus[i]) * inv
        rs.append(r)
        invs.append(inv)
        xhats.append(xhat)
        sp = (xhat * S[i] + Bb[i]).astype(dt)

    dys = [None] * G
    dS = [None] * G
    dBb = [None] * G
    dX_groups = [None] * (G + 1)
    dX_groups[G] = g_out[..., G * w:]
    carry = None
    for i in reversed(range(G)):
        gz = g_out[..., i * w:(i + 1) * w].astype(jnp.float32)
        if carry is not None:
            gz = gz + carry
        dBb[i] = jnp.sum(gz, axis=(0, 1))
        dS[i] = jnp.sum(gz * xhats[i], axis=(0, 1))
        dxhat = gz * S[i]
        m1 = jnp.mean(dxhat, axis=(0, 1))
        m2 = jnp.mean(dxhat * xhats[i], axis=(0, 1))
        dr = invs[i] * (dxhat - m1 - xhats[i] * m2)
        dr = dr + g_mus[i] / n + (2.0 / n) * g_vrs[i] * (rs[i] - mus[i])
        dy = jnp.where(ys[i] > 0, dr, 0.0).astype(dt)
        dys[i] = dy
        # data gradient of the dilated conv: dsp[u] = dy[u+d] K0^T +
        # dy[u] K1^T + dy[u-d] K2^T (one shift-taps matmul)
        dy3 = jnp.concatenate([_shift(dy, -d), dy, _shift(dy, d)], axis=-1)
        Wr = jnp.concatenate(
            [W[i, 0].T, W[i, 1].T, W[i, 2].T], axis=0).astype(dt)
        dsp = jnp.einsum("btk,ko->bto", dy3, Wr).astype(jnp.float32)
        dX_groups[i] = dsp
        carry = dsp  # flows into z_{i-1} through sp_in_i = z_{i-1} + g_i

    # ONE batched einsum for every weight gradient
    X3 = jnp.stack([_taps(sp_ins[i], d) for i in range(G)])   # (G,B,T,3w)
    DY = jnp.stack(dys)                                       # (G,B,T,w)
    dW = jnp.einsum("gbtk,gbto->gko", X3, DY,
                    preferred_element_type=jnp.float32)
    dW = dW.reshape(G, 3, w, w).astype(W.dtype)
    dCB = jnp.stack([jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
                     for dy in dys])

    dX = jnp.concatenate(
        [g.astype(jnp.float32) if g.dtype != jnp.float32 else g
         for g in dX_groups], axis=-1).astype(dt)
    return (dX, dW, dCB.astype(jnp.float32), jnp.stack(dS), jnp.stack(dBb))


res2_chain_train.defvjp(_fwd, _bwd)
