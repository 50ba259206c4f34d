"""Direct parity tests for the rank-sort prep kernel
(ops/pallas/ranksort_kernel.py) — the round-5 bucketed-SA prep.

The kernel's contract (its docstring): stable rank equal to
``jnp.argsort(jnp.argsort(key, stable=True))``; sorted coordinate planes
bit-exact f32; the packed [N, 16] split byte-identical to
``sabucket._split_with_ids(sorted_xyz, order)``; feature planes carried
through the same permutation.  It is already covered transitively by the
bucketed-SA bit-parity suite (test_sabucket.py routes every bucketed call
through it), but that only checks the pooled END result — these tests pin
each emitted operand directly, so a prep regression localizes here.

No reference counterpart (the reference has no spatial bucketing; see the
kernel docstring's citation of tf_grouping_g.cu:3-36 for why it exists).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanobjectnn_tpu.ops.pallas.ranksort_kernel import rank_sort_points
from scanobjectnn_tpu.ops.pallas.sabucket_kernel import _split_with_ids

B, N = 3, 256


def _mk(seed, ties: bool):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(B, N, 3).astype(np.float32)
    key = xyz[:, :, 0].copy()
    if ties:
        # Coarse quantization forces many exact key duplicates, so the
        # stable tie rule (original order) is actually exercised.
        key = np.round(key * 4.0) / 4.0
    return jnp.asarray(key), jnp.asarray(xyz)


def _order(key):
    # Sort permutation per cloud; numpy stable sort == jnp stable argsort.
    return np.stack([np.argsort(np.asarray(k), kind="stable") for k in key])


@pytest.mark.parametrize("ties", [False, True], ids=["unique", "ties"])
def test_rank_matches_stable_argsort(ties):
    key, xyz = _mk(0, ties)
    xyz_t = jnp.transpose(xyz, (0, 2, 1))
    _, _, _, rank = rank_sort_points(key, xyz_t, None, False, True, True)
    expect = np.stack(
        [np.argsort(o) for o in _order(key)]
    )  # inverse of the sort permutation
    np.testing.assert_array_equal(np.asarray(rank), expect)


@pytest.mark.parametrize("ties", [False, True], ids=["unique", "ties"])
def test_sorted_planes_bit_exact(ties):
    key, xyz = _mk(1, ties)
    xyz_t = jnp.transpose(xyz, (0, 2, 1))
    planes_s, _, _, _ = rank_sort_points(key, xyz_t, None, False, False, True)
    order = _order(key)
    for b in range(B):
        expect = np.asarray(xyz)[b][order[b]].T  # [3, N] sorted planes
        np.testing.assert_array_equal(np.asarray(planes_s)[b, 0:3], expect)
    # Rows 3-7 are declared zero sublane padding.
    assert not np.asarray(planes_s)[:, 3:8].any()


def test_packed_split_matches_split_with_ids():
    key, xyz = _mk(2, True)
    xyz_t = jnp.transpose(xyz, (0, 2, 1))
    _, split_s, _, _ = rank_sort_points(key, xyz_t, None, True, False, True)
    order = _order(key)
    sorted_xyz = jnp.asarray(
        np.stack([np.asarray(xyz)[b][order[b]] for b in range(B)])
    )
    expect = _split_with_ids(sorted_xyz, jnp.asarray(order))
    np.testing.assert_array_equal(
        np.asarray(split_s).view(np.uint16), np.asarray(expect).view(np.uint16)
    )


def test_feature_planes_ride_the_permutation():
    c = 16
    key, xyz = _mk(3, False)
    xyz_t = jnp.transpose(xyz, (0, 2, 1))
    rng = np.random.RandomState(4)
    featp = jnp.asarray(
        rng.randn(B, c, N).astype(np.float32), jnp.bfloat16
    )  # [B, C, N] bf16 payload (1-term, one-hot-exact)
    _, _, featp_s, _ = rank_sort_points(key, xyz_t, featp, False, False, True)
    order = _order(key)
    for b in range(B):
        expect = np.asarray(featp, np.float32)[b].T[order[b]]  # [N, C]
        np.testing.assert_array_equal(
            np.asarray(featp_s, np.float32)[b], expect
        )
