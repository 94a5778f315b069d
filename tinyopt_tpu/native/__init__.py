"""Native (C++) micro-runtime for tiny host-side solves.

The XLA path is right for batched/large problems; a *single* solve of a
≤64-dim problem is dominated by dispatch latency there (~100 µs+).  The
reference's headline benchmark regime is exactly such solves at ~1 µs
(reference: benchmarks/dense.cpp:28-114, BASELINE.md).  This package
compiles ``tinyopt_native.cpp`` — a dependency-free dense LM/GN/GD core
with the same semantics as the jitted loop — on first use and binds it
with ctypes.

Two ways in:

* ``native_optimize(x0, res_jac_fn, n_res, ...)`` — user callback filling
  (residuals, Jacobian); microsecond-scale when the callback is a C
  function pointer, Python-callback supported (at Python call cost).
* ``bench_prior`` / ``bench_sqrt2`` — the reference benchmark problems
  built into the shared library (zero callback overhead), used by
  ``bench.py`` for the µs-latency parity rows.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Callable, NamedTuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tinyopt_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libtinyopt_native.so")

_lib = None


class _NativeOptions(ctypes.Structure):
    _fields_ = [
        ("solver_type", ctypes.c_int32),
        ("max_iters", ctypes.c_int32),
        ("max_consec_failures", ctypes.c_int32),
        ("max_total_failures", ctypes.c_int32),
        ("min_error", ctypes.c_double),
        ("min_rerr_dec", ctypes.c_double),
        ("min_step_norm2", ctypes.c_double),
        ("min_grad_norm2", ctypes.c_double),
        ("damping_init", ctypes.c_double),
        ("damping_min", ctypes.c_double),
        ("damping_max", ctypes.c_double),
        ("good_factor", ctypes.c_double),
        ("bad_factor", ctypes.c_double),
        ("gd_lr", ctypes.c_double),
    ]


class _NativeOutput(ctypes.Structure):
    _fields_ = [
        ("final_cost", ctypes.c_double),
        ("stop_reason", ctypes.c_int32),
        ("num_iters", ctypes.c_int32),
        ("num_failures", ctypes.c_int32),
        ("num_consec_failures", ctypes.c_int32),
    ]


_RESJAC = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.c_int, ctypes.c_void_p)
_RESJAC_F = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.c_int, ctypes.c_void_p)


def _build() -> str:
    """Compile the shared library if missing or stale."""
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    # mkstemp (not mktemp): the name is created-and-reserved atomically,
    # so two processes compiling concurrently cannot write the same temp
    # file and publish a torn .so via os.replace.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
               "-march=native", _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    lib.tinyopt_default_options.argtypes = [ctypes.POINTER(_NativeOptions)]
    lib.tinyopt_solve.restype = ctypes.c_int32
    lib.tinyopt_solve.argtypes = [
        ctypes.c_int32, ctypes.c_int32, _RESJAC, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(_NativeOptions),
        ctypes.POINTER(_NativeOutput), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.tinyopt_bench_prior.restype = ctypes.c_int32
    lib.tinyopt_bench_prior.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(_NativeOptions), ctypes.POINTER(_NativeOutput)]
    lib.tinyopt_bench_sqrt2.restype = ctypes.c_int32
    lib.tinyopt_bench_sqrt2.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(_NativeOptions),
        ctypes.POINTER(_NativeOutput)]
    lib.tinyopt_bench_prior_us.restype = ctypes.c_double
    lib.tinyopt_bench_prior_us.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(_NativeOptions), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double)]
    lib.tinyopt_bench_sqrt2_us.restype = ctypes.c_double
    lib.tinyopt_bench_sqrt2_us.argtypes = [
        ctypes.c_double, ctypes.POINTER(_NativeOptions), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double)]
    # float32 instantiation (same semantics at f32 working precision;
    # reference float suite benchmarks/densef.cpp:24-50)
    cf = ctypes.POINTER(ctypes.c_float)
    lib.tinyopt_solve_f32.restype = ctypes.c_int32
    lib.tinyopt_solve_f32.argtypes = [
        ctypes.c_int32, ctypes.c_int32, _RESJAC_F, ctypes.c_void_p, cf,
        ctypes.POINTER(_NativeOptions), ctypes.POINTER(_NativeOutput),
        cf, cf]
    lib.tinyopt_bench_prior_f32.restype = ctypes.c_int32
    lib.tinyopt_bench_prior_f32.argtypes = [
        ctypes.c_int32, cf, cf, cf, ctypes.POINTER(_NativeOptions),
        ctypes.POINTER(_NativeOutput)]
    lib.tinyopt_bench_sqrt2_f32.restype = ctypes.c_int32
    lib.tinyopt_bench_sqrt2_f32.argtypes = [
        cf, ctypes.POINTER(_NativeOptions), ctypes.POINTER(_NativeOutput)]
    lib.tinyopt_bench_prior_us_f32.restype = ctypes.c_double
    lib.tinyopt_bench_prior_us_f32.argtypes = [
        ctypes.c_int32, cf, cf, cf, ctypes.POINTER(_NativeOptions),
        ctypes.c_int32, cf]
    lib.tinyopt_bench_sqrt2_us_f32.restype = ctypes.c_double
    lib.tinyopt_bench_sqrt2_us_f32.argtypes = [
        ctypes.c_float, ctypes.POINTER(_NativeOptions), ctypes.c_int32,
        cf]
    _lib = lib
    return lib


class NativeResult(NamedTuple):
    x: np.ndarray
    final_cost: float
    stop_reason: int
    num_iters: int
    num_failures: int


#: Compile-time bound of the C core's stack scratch (tinyopt_native.cpp
#: kMaxDims); enforced HERE because the bench entry points copy into the
#: scratch before the C-side dims check runs.
MAX_DIMS = 128


def _check_dims(d: int) -> None:
    if d > MAX_DIMS:
        raise ValueError(
            f"native runtime supports at most {MAX_DIMS} dims (got {d}); "
            "use the XLA path (to.optimize / to.matfree_optimize) for "
            "larger problems")


_SOLVER_CODE = {"lm": 0, "gn": 1, "gd": 2}


def make_options(solver: str = "lm", dtype=np.float64,
                 **kw) -> _NativeOptions:
    """Native options; ``dtype=np.float32`` rescales the default stop
    thresholds to f32 floors (Options.for_dtype semantics: squared
    thresholds by the FloatEpsilon ratio squared, relative by the
    ratio) — explicit keyword thresholds are NOT rescaled."""
    lib = _load()
    o = _NativeOptions()
    lib.tinyopt_default_options(ctypes.byref(o))
    o.solver_type = _SOLVER_CODE[solver]
    if np.dtype(dtype) == np.float32:
        ratio = 1e-4 / 1e-7           # utils.float_epsilon f32 / f64
        o.min_error *= ratio ** 2
        o.min_rerr_dec *= ratio
        o.min_step_norm2 *= ratio ** 2
        o.min_grad_norm2 *= ratio ** 2
    elif np.dtype(dtype) != np.float64:
        raise TypeError(f"native runtime supports f32/f64, got {dtype}")
    valid = {name for name, _ in _NativeOptions._fields_}
    for k, v in kw.items():
        if k not in valid:
            raise TypeError(
                f"unknown native option {k!r}; valid fields: "
                f"{sorted(valid - {'solver_type'})}")
        setattr(o, k, v)
    return o


def native_optimize(x0, res_jac_fn: Callable, n_res: int,
                    options: _NativeOptions | None = None) -> NativeResult:
    """Host-native dense solve with a Python (or C) residual callback.

    ``res_jac_fn(x: (d,) ndarray) -> (r: (n_res,), J: (n_res, d))``.
    """
    lib = _load()
    x = np.ascontiguousarray(np.asarray(x0, np.float64).ravel()).copy()
    d = x.size
    _check_dims(d)
    opts = options or make_options()
    out = _NativeOutput()
    r_buf = np.zeros(n_res, np.float64)
    J_buf = np.zeros(n_res * d, np.float64)

    # ctypes callbacks cannot propagate Python exceptions: capture any
    # raised error, poison the residuals with NaN so the C loop stops
    # with kSystemHasNaNOrInf instead of "converging" on a zero buffer,
    # and re-raise host-side after the solve returns.
    cb_error: list = []

    @_RESJAC
    def cb(x_ptr, r_ptr, J_ptr, jac, _ctx):
        rr = np.ctypeslib.as_array(r_ptr, shape=(n_res,))
        try:
            xv = np.ctypeslib.as_array(x_ptr, shape=(d,))
            r, J = res_jac_fn(xv.copy())
            rr[:] = np.asarray(r, np.float64).ravel()
            if jac:
                JJ = np.ctypeslib.as_array(J_ptr, shape=(n_res * d,))
                JJ[:] = np.asarray(J, np.float64).ravel()
        except Exception as e:  # noqa: BLE001 - relayed to the caller
            if not cb_error:
                cb_error.append(e)
            rr[:] = np.nan

    lib.tinyopt_solve(
        d, n_res, cb, None,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(opts), ctypes.byref(out),
        r_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        J_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if cb_error:
        raise cb_error[0]
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)


def bench_prior(y, inv_std, x0,
                options: _NativeOptions | None = None) -> NativeResult:
    """One native LM solve of the whitened prior (zero callback cost)."""
    lib = _load()
    y = np.ascontiguousarray(np.asarray(y, np.float64))
    s = np.ascontiguousarray(np.asarray(inv_std, np.float64))
    x = np.ascontiguousarray(np.asarray(x0, np.float64)).copy()
    _check_dims(x.size)
    opts = options or make_options()
    out = _NativeOutput()
    lib.tinyopt_bench_prior(
        x.size, y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(opts), ctypes.byref(out))
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)


def bench_prior_us(y, inv_std, x0, reps: int = 10_000,
                   options: _NativeOptions | None = None) -> tuple:
    """(mean µs per solve, x_opt) — timed inside the shared library."""
    lib = _load()
    y = np.ascontiguousarray(np.asarray(y, np.float64))
    s = np.ascontiguousarray(np.asarray(inv_std, np.float64))
    x0 = np.ascontiguousarray(np.asarray(x0, np.float64))
    _check_dims(x0.size)
    x_out = np.zeros_like(x0)
    opts = options or make_options()
    us = lib.tinyopt_bench_prior_us(
        x0.size, y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(opts), reps,
        x_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return us, x_out


def bench_sqrt2_us(x0: float = 1.0, reps: int = 100_000,
                   options: _NativeOptions | None = None) -> float:
    lib = _load()
    opts = options or make_options()
    x_out = np.zeros(1, np.float64)
    return lib.tinyopt_bench_sqrt2_us(
        x0, ctypes.byref(opts), reps,
        x_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))


def bench_sqrt2(x0: float = 1.0,
                options: _NativeOptions | None = None) -> NativeResult:
    lib = _load()
    x = np.asarray([x0], np.float64)
    opts = options or make_options()
    out = _NativeOutput()
    lib.tinyopt_bench_sqrt2(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(opts), ctypes.byref(out))
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)


# ---------------------------------------------------------------------
# float32 instantiation (reference float suite, densef.cpp:24-50)
# ---------------------------------------------------------------------

def _f32(a):
    return np.ascontiguousarray(np.asarray(a, np.float32))


def bench_prior_us_f32(y, inv_std, x0, reps: int = 10_000,
                       options: _NativeOptions | None = None) -> tuple:
    """(mean µs per f32 prior solve, x_opt) — timed inside the library."""
    lib = _load()
    y, s, x0 = _f32(y), _f32(inv_std), _f32(x0)
    _check_dims(x0.size)
    x_out = np.zeros_like(x0)
    opts = options or make_options(dtype=np.float32)
    cf = ctypes.POINTER(ctypes.c_float)
    us = lib.tinyopt_bench_prior_us_f32(
        x0.size, y.ctypes.data_as(cf), s.ctypes.data_as(cf),
        x0.ctypes.data_as(cf), ctypes.byref(opts), reps,
        x_out.ctypes.data_as(cf))
    return us, x_out


def bench_sqrt2_us_f32(x0: float = 1.0, reps: int = 100_000,
                       options: _NativeOptions | None = None) -> float:
    """Mean µs per f32 sqrt2 solve (reference row 0: 0.91 µs float)."""
    lib = _load()
    opts = options or make_options(dtype=np.float32)
    x_out = np.zeros(1, np.float32)
    return lib.tinyopt_bench_sqrt2_us_f32(
        x0, ctypes.byref(opts), reps,
        x_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))


def bench_sqrt2_f32(x0: float = 1.0,
                    options: _NativeOptions | None = None) -> NativeResult:
    lib = _load()
    x = np.asarray([x0], np.float32)
    opts = options or make_options(dtype=np.float32)
    out = _NativeOutput()
    lib.tinyopt_bench_sqrt2_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(opts), ctypes.byref(out))
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)


def bench_prior_f32(y, inv_std, x0,
                    options: _NativeOptions | None = None) -> NativeResult:
    """One native f32 LM solve of the whitened prior."""
    lib = _load()
    y, s, x = _f32(y), _f32(inv_std), _f32(x0).copy()
    _check_dims(x.size)
    opts = options or make_options(dtype=np.float32)
    out = _NativeOutput()
    cf = ctypes.POINTER(ctypes.c_float)
    lib.tinyopt_bench_prior_f32(
        x.size, y.ctypes.data_as(cf), s.ctypes.data_as(cf),
        x.ctypes.data_as(cf), ctypes.byref(opts), ctypes.byref(out))
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)


def native_optimize_f32(x0, res_jac_fn: Callable, n_res: int,
                        options: _NativeOptions | None = None
                        ) -> NativeResult:
    """f32 host-native dense solve with a Python residual callback
    (float32 buffers end-to-end; params_trait<float> analogue)."""
    lib = _load()
    x = _f32(np.asarray(x0).ravel()).copy()
    d = x.size
    _check_dims(d)
    opts = options or make_options(dtype=np.float32)
    out = _NativeOutput()
    r_buf = np.zeros(n_res, np.float32)
    J_buf = np.zeros(n_res * d, np.float32)
    cb_error: list = []

    @_RESJAC_F
    def cb(x_ptr, r_ptr, J_ptr, jac, _ctx):
        rr = np.ctypeslib.as_array(r_ptr, shape=(n_res,))
        try:
            xv = np.ctypeslib.as_array(x_ptr, shape=(d,))
            r, J = res_jac_fn(xv.copy())
            rr[:] = np.asarray(r, np.float32).ravel()
            if jac:
                JJ = np.ctypeslib.as_array(J_ptr, shape=(n_res * d,))
                JJ[:] = np.asarray(J, np.float32).ravel()
        except Exception as e:  # noqa: BLE001 - relayed to the caller
            if not cb_error:
                cb_error.append(e)
            rr[:] = np.nan

    cf = ctypes.POINTER(ctypes.c_float)
    lib.tinyopt_solve_f32(
        d, n_res, cb, None, x.ctypes.data_as(cf), ctypes.byref(opts),
        ctypes.byref(out), r_buf.ctypes.data_as(cf),
        J_buf.ctypes.data_as(cf))
    if cb_error:
        raise cb_error[0]
    return NativeResult(x, out.final_cost, out.stop_reason, out.num_iters,
                        out.num_failures)
