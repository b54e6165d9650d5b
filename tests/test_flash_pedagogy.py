"""The reference's only numerical cross-check, as a real test
(flash_attention_example.py:154-190: FA-v1 vs FA-v2 max-abs error)."""

import numpy as np

from flash_attention_example import (dense_attention, flash_attention_v1,
                                     flash_attention_v2)


def test_flash_v1_v2_match_dense():
    rng = np.random.default_rng(0)
    n, d = 128, 32
    q, k, v = (rng.standard_normal((n, d)) for _ in range(3))
    scale = d ** -0.5
    ref = dense_attention(q, k, v, scale)
    np.testing.assert_allclose(flash_attention_v1(q, k, v, scale), ref,
                               atol=1e-10)
    np.testing.assert_allclose(flash_attention_v2(q, k, v, scale), ref,
                               atol=1e-10)
