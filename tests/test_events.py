"""Event detection: numpy oracle vs reference dumps, and the batched JAX
implementation vs the numpy oracle (reference: src/event_detector.cpp)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from uncalled_tpu.ops.events import TAIL, detect_block, detect_events_np, make_detector_state

GOLDEN_MAP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "golden_rig",
    "golden_map",
)
INDEX_PREFIX = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "example_index", "example_ref"
)


def reference_events(signal):
    """Run the reference EventDetector via the golden rig binary."""
    with tempfile.NamedTemporaryFile(suffix=".f32") as f:
        signal.astype(np.float32).tofile(f.name)
        out = subprocess.run(
            [GOLDEN_MAP, INDEX_PREFIX, f.name, "x", "--events"],
            capture_output=True,
            text=True,
            timeout=120,
        )
    rows = [l.split("\t") for l in out.stdout.splitlines() if l.startswith("E\t")]
    return {
        "start": np.array([int(r[1]) for r in rows]),
        "length": np.array([float(r[2]) for r in rows], dtype=np.float32),
        "mean": np.array([float(r[3]) for r in rows], dtype=np.float32),
        "stdv": np.array([float(r[4]) for r in rows], dtype=np.float32),
    }


needs_rig = pytest.mark.skipif(
    not os.path.exists(GOLDEN_MAP), reason="golden rig binary not built"
)


@needs_rig
def test_oracle_matches_reference_detector(golden_reads):
    sig = golden_reads["sim_0005_Escherichia_coli_3483_+"]
    want = reference_events(sig)
    got = detect_events_np(sig)
    assert len(got["mean"]) == len(want["mean"])
    assert np.array_equal(got["start"], want["start"])
    assert np.array_equal(got["mean"], want["mean"])
    assert np.array_equal(got["stdv"], want["stdv"])


@needs_rig
def test_oracle_matches_reference_detector_real_read(golden_reads):
    sig = golden_reads["f41a60f7-de4a-4b17-9f54-387e52d60b65"]
    want = reference_events(sig)
    got = detect_events_np(sig)
    assert len(got["mean"]) == len(want["mean"])
    assert np.array_equal(got["mean"], want["mean"])


def _run_jax_blocks(sig, block):
    import jax.numpy as jnp

    state = make_detector_state(1)
    means, starts = [], []
    n = (len(sig) // block) * block
    for i in range(0, n, block):
        state, out = detect_block(state, jnp.asarray(sig[None, i : i + block]))
        f = np.asarray(out["fired"][0])
        means.append(np.asarray(out["mean"][0])[f])
        starts.append(np.asarray(out["start"][0])[f])
    return np.concatenate(means), np.concatenate(starts), n


@pytest.mark.parametrize("block", [512, 4096])
def test_jax_detector_matches_oracle(golden_reads, block):
    sig = golden_reads["sim_0008_Escherichia_coli_1891_+"]
    want = detect_events_np(sig)
    means, starts, n = _run_jax_blocks(sig, block)
    # same events up to where the block stream ended
    k = np.searchsorted(want["start"], n - 16)
    k = min(k, len(means))
    assert len(means) >= k
    assert np.array_equal(starts[:k], want["start"][:k])
    # f32 block-local prefix sums vs f64 global: tiny numeric slack
    np.testing.assert_allclose(means[:k], want["mean"][:k], rtol=2e-5, atol=2e-3)


def test_jax_detector_batch_consistency(golden_reads):
    """Two different reads detected in one batch == each detected alone."""
    import jax.numpy as jnp

    a = golden_reads["sim_0008_Escherichia_coli_1891_+"][:4096]
    b = golden_reads["noise_1"][:4096]
    batch = np.stack([a, b])
    state = make_detector_state(2)
    _, out = detect_block(state, jnp.asarray(batch))
    for i, sig in enumerate([a, b]):
        solo_state = make_detector_state(1)
        _, solo = detect_block(solo_state, jnp.asarray(sig[None]))
        assert np.array_equal(
            np.asarray(out["fired"][i]), np.asarray(solo["fired"][0])
        )
        fa = np.asarray(out["fired"][i])
        np.testing.assert_array_equal(
            np.asarray(out["mean"][i])[fa], np.asarray(solo["mean"][0])[fa]
        )


def test_native_detector_bitexact(golden_reads):
    """C++ detector (uncalled_tpu/native/event_detector.cpp) == numpy oracle."""
    from uncalled_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    for rid in ["sim_0005_Escherichia_coli_3483_+", "noise_1"]:
        sig = golden_reads[rid]
        a = native.detect_events(sig, 0.0, 40000.0)
        b = detect_events_np(sig)
        assert np.array_equal(a["start"], b["start"])
        assert np.array_equal(a["mean"], b["mean"])
        assert np.array_equal(a["stdv"], b["stdv"])
        assert a["total_events"] == b["total_events"]
        assert np.float32(a["len_sum"]) == np.float32(b["len_sum"])


def test_detector_calibration_hook():
    """Mid-stream calibration (event_detector.cpp:155-162 set_calibration):
    event means/stdvs become (v + offset) * range/digitisation in f32
    BEFORE the min/max mean filter (create_event calibrates both fields,
    event_detector.cpp:308-309; the filter at :107-108 sees calibrated
    means).  np oracle and native path must agree."""
    import numpy as np

    from uncalled_tpu import native
    from uncalled_tpu.ops.events import detect_events_np

    rng = np.random.default_rng(5)
    # integer-ish raw signal (uncalibrated DAC counts)
    sig = (rng.normal(450, 40, 6000).astype(np.float32)).round()
    cal = (10.0, 1300.0, 8192.0)  # offset, range, digitisation
    coef = np.float32(cal[1]) / np.float32(cal[2])

    raw = detect_events_np(sig, -1e38, 1e38)
    cald = detect_events_np(sig, 30.0, 73.0, calibration=cal)
    # calibrated means = (raw + off) * coef, filtered on the CALIBRATED value
    want_mean = ((raw["mean"] + np.float32(cal[0])) * coef).astype(np.float32)
    want_stdv = ((raw["stdv"] + np.float32(cal[0])) * coef).astype(np.float32)
    keep = (want_mean >= np.float32(30.0)) & (want_mean <= np.float32(73.0))
    assert keep.any() and not keep.all()  # the filter actually bites
    assert np.array_equal(cald["mean"], want_mean[keep])
    assert np.array_equal(cald["stdv"], want_stdv[keep])
    assert cald["total_events"] == raw["total_events"]  # counts pre-filter

    nat = native.detect_events(sig, 30.0, 73.0, calibration=cal)
    if nat is not None:
        assert np.array_equal(nat["mean"], cald["mean"])
        assert np.array_equal(nat["stdv"], cald["stdv"])
        assert np.array_equal(nat["start"], cald["start"])
        assert nat["total_events"] == cald["total_events"]
