"""Analytic MXU flop counting from a jaxpr.

XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body's flops ONCE,
so programs that scan over layers (``models/necks/second_rpn.py``) report a
fraction of their real work — the r4 A/B made it obvious (the same model
reported 4.3% "MFU" scanned vs 9.6% unrolled at near-identical step time).
This walker counts matmul/conv flops exactly, multiplying scan bodies by
their trip count and recursing through call primitives. Elementwise work is
ignored (standard MFU convention: model flops = 2*MACs of dots/convs).
"""

from __future__ import annotations

import math


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_flops(eqn) -> float:
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    dn = eqn.params["dimension_numbers"]
    (lc, rc), (lb, _rb) = dn
    m = _prod(s for i, s in enumerate(lhs) if i not in set(lc) | set(lb))
    k = _prod(lhs[i] for i in lc)
    n = _prod(s for i, s in enumerate(rhs)
              if i not in set(rc) | set(dn[1][1]))
    b = _prod(lhs[i] for i in lb)
    return 2.0 * b * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    # rhs_spec = (out_feature_dim, in_feature_dim, *spatial); for grouped
    # convs the kernel's in_feature dim is ALREADY per-group, so no division
    in_ch = rhs[dn.rhs_spec[1]]
    k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    return 2.0 * _prod(out) * k_spatial * in_ch


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs nested under this eqn."""
    p = eqn.params
    name = eqn.primitive.name
    if name == "scan":
        yield p["jaxpr"].jaxpr, int(p["length"])
        return
    if name == "while":
        # trip count unknowable statically; count one iteration of each
        yield p["cond_jaxpr"].jaxpr, 1
        yield p["body_jaxpr"].jaxpr, 1
        return
    if name == "cond":
        # branches are exclusive; take the max so MFU stays a lower bound
        branches = p.get("branches", ())
        if branches:
            best = max(branches, key=lambda b: count_flops(b.jaxpr))
            yield best.jaxpr, 1
        return
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        sub = p.get(key)
        if sub is not None:
            yield getattr(sub, "jaxpr", sub), 1
            return


def count_flops(jaxpr) -> float:
    """Total dot/conv flops in a (possibly nested) jaxpr."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _sub_jaxprs(eqn):
                total += mult * count_flops(sub)
    return total


def traced_flops(traced) -> float:
    """flops of a ``jax.jit(f).trace(*args)`` result."""
    return count_flops(traced.jaxpr.jaxpr)


def mfu(flops_per_step: float, step_seconds: float, peak_flops: float):
    if not flops_per_step or flops_per_step <= 0 or step_seconds <= 0:
        return None
    if not math.isfinite(flops_per_step):
        return None
    return flops_per_step / step_seconds / peak_flops
