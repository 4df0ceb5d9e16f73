"""The round-6 Arrow kernels replicate the JVM fold arithmetic BIT-FOR-BIT.

The similarity family's numpy kernels (_np_fold_dots/_np_fold_norms/
_np_fold_gram) claim exact IEEE equality with the sequential left-fold the
F.aggregate expression form (and the DuckDB oracle's list_dot_product)
computes. These tests pin that claim against a pure-Python sequential
model on awkward values (denormals-adjacent magnitudes, sign mixes,
catastrophic-cancellation sums) where pairwise/blocked summation would
diverge in the last ulp."""

import math
import random

import numpy as np

from uckg_spark.operators.similarity import (
    _np_centroid_arrays,
    _np_fold_dots,
    _np_fold_gram,
    _np_fold_norms,
)


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _vecs(n, dim, seed):
    rng = random.Random(seed)
    # magnitudes spanning ~30 orders + sign mixes: summation-order
    # differences would be visible in the last bits
    return [
        [rng.choice([-1.0, 1.0]) * rng.random() * 10.0 ** rng.randint(-15, 15)
         for _ in range(dim)]
        for _ in range(n)
    ]


def test_fold_dots_bit_identical_to_sequential():
    V = _vecs(40, 17, seed=1)
    C = _vecs(5, 17, seed=2)
    got = _np_fold_dots(np.array(V), np.array(C))
    for i, v in enumerate(V):
        for j, c in enumerate(C):
            want = _seq_dot(v, c)
            assert got[i, j] == want, (i, j, got[i, j], want)


def test_fold_norms_bit_identical_to_sequential():
    V = _vecs(40, 33, seed=3)
    got = _np_fold_norms(np.array(V))
    for i, v in enumerate(V):
        assert got[i] == math.sqrt(_seq_dot(v, v))


def test_fold_gram_bit_identical_to_sequential():
    V = _vecs(12, 9, seed=4)
    got = _np_fold_gram(np.array(V))
    for i, a in enumerate(V):
        for j, b in enumerate(V):
            assert got[i, j] == _seq_dot(a, b)


def test_centroid_arrays_sort_and_norms():
    cents = [(7, [3.0, 4.0]), (2, [1.0, 2.0])]
    cids, mat, cnorm = _np_centroid_arrays(cents)
    assert list(cids) == [2, 7]
    assert mat.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert cnorm.tolist() == [math.sqrt(1.0 * 1.0 + 2.0 * 2.0), 5.0]
