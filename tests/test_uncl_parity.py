"""Byte-parity of the fitted .uncl parameter file vs the reference.

The index parameterizer (index/parameterize.py) must reproduce the
reference's bundled example_ref.uncl byte-for-byte: same self-align
sampling (glibc rand() replica), same fitting, same serialization
(reference uncalled/index.py + scripts/uncalled:38-76).
"""

import os

import pytest

REF_UNCL = "/root/reference/example/index/example_ref.uncl"


@pytest.mark.skipif(not os.path.exists(REF_UNCL), reason="reference absent")
def test_uncl_byte_identical(example_index, tmp_path):
    from uncalled_tpu.index.parameterize import build_uncl

    out = build_uncl(example_index, str(tmp_path / "example_ref"))
    with open(out, "rb") as f:
        got = f.read()
    with open(REF_UNCL, "rb") as f:
        want = f.read()
    assert got == want
