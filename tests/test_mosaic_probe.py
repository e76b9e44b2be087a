"""Mosaic row-gather regression probe, promoted into the suite (VERDICT r3
item 6).

docs/pallas_decision.md: the fused quad-gather Pallas kernel — worth 2-3x on
the dominant per-index gather term — is blocked because Mosaic cannot lower a
vectorized dynamic row-gather from VMEM (re-probed UNSUPPORTED on jax 0.8 and
0.9 with identical errors).  This test re-runs the probe on every TPU test
session: the moment a jax upgrade lowers either spelling, the test FAILS
LOUDLY with the instruction to build the kernel, so the identified headroom
cannot be silently stranded.

Skipped off-TPU (Mosaic lowering needs a real TPU backend; the CPU conftest
mesh cannot exercise it).  Run manually with:
  NVFI_TEST_TPU=1 python -m pytest tests/test_mosaic_probe.py -s --no-header
(one TPU process at a time — don't run while a training job holds the tunnel).
"""

import jax
import jax.numpy as jnp
import pytest


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _probe(kernel_body) -> tuple[bool, str]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        fn = pl.pallas_call(
            kernel_body,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(
            jnp.arange(1024, dtype=jnp.int32) % 512,
            jnp.ones((512, 128), jnp.float32),
        )
        return True, f"sum={float(out.sum())}"
    except Exception as e:  # lowering errors are the expected outcome today
        return False, f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"


@pytest.mark.skipif(not _on_tpu(), reason="Mosaic lowering needs a TPU backend")
def test_mosaic_row_gather_still_unsupported():
    """FAILS when Mosaic starts lowering vectorized dynamic row-gathers —
    that failure is the action item: build the fused quad-gather kernel
    (docs/pallas_decision.md §1-3, ~2-3x on the dominant gather term)."""

    def k_direct(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def k_take(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    results = {
        "ref[vec_idx, :]": _probe(k_direct),
        "jnp.take(axis=0)": _probe(k_take),
    }
    for label, (ok, msg) in results.items():
        print(f"[mosaic-probe] {label}: {'SUPPORTED' if ok else 'UNSUPPORTED'} ({msg})")

    newly_supported = [label for label, (ok, _) in results.items() if ok]
    assert not newly_supported, (
        f"Mosaic now lowers {newly_supported} — the fused quad-gather Pallas "
        "kernel is UNBLOCKED.  Build it: docs/pallas_decision.md records the "
        "design and the measured 2-3x headroom on the per-index gather term "
        "(scripts/perf_micro2.py has the microbenchmark harness)."
    )
