"""Multi-device scaling-efficiency guard (BASELINE.md:38-41 north star).

The dp axis has ZERO cross-device communication — any loss of per-device
throughput on the virtual mesh is either host-core contention (virtual
devices share cores; not a framework property) or a framework regression
(e.g. accidentally serialized per-device dispatch, a spurious collective,
a replicated computation that should be sharded).  The assertions below
are sized to catch the second class while tolerating the first on small
CI hosts:

  * parallel speedup must EXIST: 4 devices >= 1.9x the total throughput
    of 1 device (a serialized program would stay at ~1.0x);
  * with idle cores backing both devices, 2-device per-device efficiency
    must hold >= 0.6 (measured 0.85-0.92 on a quiet 4-core host;
    PARITY.md records the full table);
  * 8 devices on any host: CORE-ADJUSTED efficiency (vs the
    min(1, cores/n) ceiling) >= 0.45.

Full-resolution numbers live in benchmarks/exp_scaling.py output,
recorded in PARITY.md.
"""

import os

import jax
import pytest

from benchmarks.exp_scaling import (measure_block, measure_dp,
                                    measure_schur, measure_schur_obs)


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh")


def _attempt(measure, check, attempts=3):
    """Perf smoke: pass if ANY of a few attempts satisfies the bound
    (virtualized CI hosts show sustained multi-second noise episodes
    that min-of-reps inside one attempt does not filter)."""
    last = None
    for _ in range(attempts):
        thpt = measure()
        ok, last = check(thpt), thpt
        if ok:
            return
    raise AssertionError(last)


@needs_devices
def test_dp_weak_scaling():
    cores = os.cpu_count() or 1

    def check(thpt):
        base = thpt[1]
        # no serialization: total throughput must actually grow with
        # devices (measured ~2.5x on a 4-core host, f64)
        if thpt[4] < 1.9 * base:
            return False
        # re-established r4 (min/median of 5 quiet-host trials:
        # 0.75/0.89): the clean number is ~0.89; 0.65 catches a real
        # regression while riding worst-trial noise via _attempt
        if cores >= 4 and thpt[2] / 2 / base < 0.65:
            return False
        return thpt[8] / 8 / base / min(1.0, cores / 8) >= 0.45

    _attempt(lambda: measure_dp(n_list=(1, 2, 4, 8), per_dev=4096, reps=5),
             check)


@needs_devices
def test_block_psum_scaling():
    """The psum axis pays one collective per iteration; it must still
    deliver real parallel speedup (a replicated/serialized accumulate
    would pin total throughput at ~1x; measured ~1.9x on a 4-core
    host, f64)."""
    _attempt(lambda: measure_block(n_list=(1, 4), per_dev_blocks=512,
                                   reps=5),
             lambda thpt: thpt[4] >= 1.4 * thpt[1])


@needs_devices
def test_schur_landmark_scaling():
    """Landmark-sharded grid-Schur BA (parallel/schur.py): per-device
    landmark slabs grow the TOTAL problem, so a serialized or
    replicated elimination would pin total throughput at ~1x.
    Measured r3/r4 on a 4-core host: n=4 total 1.7x (per-device 0.43,
    PARITY.md); guard at 1.35x with the CI noise protocol."""
    _attempt(lambda: measure_schur(n_list=(1, 4), per_dev_landmarks=512,
                                   reps=4),
             lambda thpt: thpt[4] >= 1.35 * thpt[1])


@needs_devices
def test_schur_obs_landmark_scaling():
    """Landmark-sharded SPARSE-OBS Schur BA (parallel/schur_obs.py —
    the r3 flagship axis, previously unguarded: VERDICT r3 weak #3).
    The sharded path replicates only the reduced camera solve; the
    per-landmark slab work must parallelize.  Measured r3 on a 4-core
    host: n=4 total 1.24x (per-device 0.31, PARITY.md — the replicated
    reduced solve is a larger fraction at toy scale); guard at 1.1x —
    a serialized sharded path measures ~0.9-1.0x and fails."""
    _attempt(lambda: measure_schur_obs(n_list=(1, 4),
                                       per_dev_landmarks=1024, reps=4),
             lambda thpt: thpt[4] >= 1.1 * thpt[1])
