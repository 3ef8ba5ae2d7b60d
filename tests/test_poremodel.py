"""Pore model parity (reference: src/pore_model.hpp:39-203)."""

import numpy as np
import pytest

from uncalled_tpu.kmer import KMER_COUNT, kmer_comp
from uncalled_tpu.poremodel import PoreModel, load_default


def test_normalizer_targets_match_reference_defaults():
    """The defaults.toml tgt_mean/tgt_stdv are the model's means_mean/means_stdv."""
    m = load_default()
    assert m.means_mean == pytest.approx(90.20827, abs=1e-4)
    assert m.means_stdv == pytest.approx(12.83266, abs=1e-4)


def test_complement_reindexes():
    tpl = PoreModel.load_npz(complement=False)
    cpl = load_default()
    ks = np.arange(KMER_COUNT)
    assert np.array_equal(cpl.means[kmer_comp(ks)], tpl.means)


def test_match_prob_formula():
    m = load_default()
    samp = np.float32(85.0)
    p = m.match_prob(samp)
    assert p.shape == (KMER_COUNT,)
    k = 137
    mu = m.means[k]
    v2 = m.vars_x2[k]
    want = -((samp - mu) ** 2) / v2 - m.lognorm_denoms[k]
    assert p[k] == pytest.approx(want, rel=1e-6)
    # higher likelihood for k-mers whose level is closer to the sample
    best = int(np.argmax(p))
    assert abs(m.means[best] - samp) == pytest.approx(
        np.min(np.abs(m.means - samp)), abs=0.5
    )


def test_match_prob_jax_matches_numpy():
    import jax.numpy as jnp

    m = load_default()
    samps = np.linspace(60, 120, 7, dtype=np.float32)
    got = np.asarray(m.match_prob(jnp.asarray(samps), xp=jnp))
    want = m.match_prob(samps)
    np.testing.assert_allclose(got, want, rtol=1e-6)
