"""Trace-level matmul/conv FLOP counting — no compile, no device.

``jaxpr_flops`` walks a ClosedJaxpr and sums 2*M*N*K for every
``dot_general`` and the standard 2*|out|*K_spatial*C_in/groups for every
``conv_general_dilated``, recursing into scan (x trip count), while (body
counted once per iteration estimate unavailable -> once), cond (max over
branches), pjit/remat/custom-diff call wrappers.

Why this exists: the bench's MFU fields need the compiled program's FLOPs,
but on the axon backend BOTH ways of asking XLA cost twice-compiles or
wedges: ``jitted.lower().compile()`` does not share the jit executable
cache (a full second multi-minute compile, the r03/r04 budget killer), and
executing an AOT-compiled executable hangs the backend outright (measured
round 5: lower+compile returned in 9 s, the first result fetch never
completed — same pathology as the persistent-cache wedge documented in
utils/misc.py).  Counting from the jaxpr gives the same dot/conv FLOPs the
XLA cost model reports (it, too, counts HLO dots/convs), purely on host, in
milliseconds.

Elementwise/reduction FLOPs are deliberately excluded — MFU against the
MXU peak is a matmul metric; including VPU ops would flatter it.
"""
from __future__ import annotations

import math
from functools import reduce
from typing import Any


def _prod(xs) -> int:
    return reduce(lambda a, b: a * int(b), xs, 1)


def _dot_general_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = _prod(lhs[i] for i in lb)
    k = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(rb))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    # 2 * |output| * (kernel_spatial_size * C_in / feature_group_count)
    out_shape = eqn.outvars[0].aval.shape
    rhs_shape = eqn.invars[1].aval.shape  # kernel
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    # kernel layout: rhs_spec = (out_ch_dim, in_ch_dim, *spatial)
    rhs_spec = dn.rhs_spec
    in_ch = rhs_shape[rhs_spec[1]]
    spatial = _prod(rhs_shape[d] for d in rhs_spec[2:])
    return 2.0 * _prod(out_shape) * spatial * in_ch / max(groups, 1)


def _sub_jaxprs(eqn):
    """Yield (closed_jaxpr, multiplier) pairs for call-like primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        yield p["jaxpr"], float(p["length"])
    elif name == "while":
        # trip count is data-dependent; count one iteration of the body
        # (callers measuring steady-state loops should avoid while_loop
        # on the hot path anyway — XLA can't pipeline across it)
        yield p["body_jaxpr"], 1.0
    elif name == "cond":
        branches = p["branches"]
        flops = [jaxpr_flops(b) for b in branches]
        # max over branches: report the heaviest path
        if flops:
            best = max(range(len(flops)), key=lambda i: flops[i])
            yield branches[best], 1.0
    else:
        for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            if key in p:
                yield p[key], 1.0
                return


def jaxpr_flops(closed_jaxpr: Any) -> float:
    """Total dot/conv FLOPs of a (Closed)Jaxpr, recursively."""
    jaxpr = getattr(closed_jaxpr, "jaxpr", closed_jaxpr)
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _sub_jaxprs(eqn):
                total += mult * jaxpr_flops(sub)
    return total


def fn_flops(fn, *args, **kwargs) -> float:
    """FLOPs of ``fn(*args)`` by tracing (host-only, no compile)."""
    import jax
    return jaxpr_flops(jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args))
