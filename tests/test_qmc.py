"""QMC sequences vs scalar reimplementations of the reference formulas
(reference include/utilities/mcqmc.h, include/yafraycore/scr_halton.h)."""
import numpy as np
import jax.numpy as jnp

from core_tpu.sampling import qmc

INV32 = 2.0 ** -32


def ref_ri_vdc(bits, r=0):
    bits = np.uint32(bits)
    bits = np.uint32((int(bits) << 16 | int(bits) >> 16) & 0xFFFFFFFF)
    b = int(bits)
    b = ((b & 0x00FF00FF) << 8) | ((b & 0xFF00FF00) >> 8)
    b = ((b & 0x0F0F0F0F) << 4) | ((b & 0xF0F0F0F0) >> 4)
    b = ((b & 0x33333333) << 2) | ((b & 0xCCCCCCCC) >> 2)
    b = ((b & 0x55555555) << 1) | ((b & 0xAAAAAAAA) >> 1)
    return min(1.0, max(0.0, (b ^ r) * INV32))


def ref_ri_s(i, r=0):
    v = 1 << 31
    while i:
        if i & 1:
            r ^= v
        i >>= 1
        v ^= v >> 1
    return min(1.0, max(0.0, r * INV32))


def ref_ri_lp(i, r=0):
    v = 1 << 31
    while i:
        if i & 1:
            r ^= v
        i >>= 1
        v |= v >> 1
    return min(1.0, max(0.0, r * INV32))


def ref_fnv(value):
    h = 0x811C9DC5
    for k in range(4):
        h ^= (value >> (8 * k)) & 0xFF
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


def ref_radical_inverse(base, i):
    v, f = 0.0, 1.0 / base
    while i:
        v += (i % base) * f
        i //= base
        f /= base
    return v


IDX = np.array([0, 1, 2, 3, 7, 12, 100, 1000, 65535, 123456, 2**31 - 1, 2**32 - 5],
               dtype=np.uint32)


def test_ri_vdc():
    got = np.asarray(qmc.ri_vdc(IDX))
    want = np.array([ref_ri_vdc(int(i)) for i in IDX], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_ri_vdc_scramble():
    got = np.asarray(qmc.ri_vdc(IDX, scramble=0xDEADBEEF))
    want = np.array([ref_ri_vdc(int(i), 0xDEADBEEF) for i in IDX], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_ri_s():
    got = np.asarray(qmc.ri_s(IDX, scramble=12345))
    want = np.array([ref_ri_s(int(i), 12345) for i in IDX], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_ri_lp():
    got = np.asarray(qmc.ri_lp(IDX, scramble=99))
    want = np.array([ref_ri_lp(int(i), 99) for i in IDX], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_fnv32a():
    got = np.asarray(qmc.fnv32a(IDX))
    want = np.array([ref_fnv(int(i)) for i in IDX], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_radical_inverse_primes():
    for base in (2, 3, 5, 7, 11, 13):
        got = np.asarray(qmc.radical_inverse(base, IDX))
        want = np.array([ref_radical_inverse(base, int(i)) for i in IDX],
                        dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=4e-7, err_msg=f"base={base}")


def test_faure_permutations_are_permutations():
    for dim in range(1, 50):
        base = int(qmc.PRIMES[dim])
        sigma = qmc._faure_permutation(base)
        assert sorted(sigma.tolist()) == list(range(base)), f"base={base}"


def test_faure_small_bases_known_values():
    # classic Faure permutations
    assert qmc._faure_permutation(2).tolist() == [0, 1]
    assert qmc._faure_permutation(3).tolist() == [0, 1, 2]
    assert qmc._faure_permutation(4).tolist() == [0, 2, 1, 3]
    assert qmc._faure_permutation(5).tolist() == [0, 3, 2, 1, 4]
    assert qmc._faure_permutation(7).tolist() == [0, 2, 5, 3, 1, 4, 6]


def test_scr_halton_dim1_equals_vdc():
    # dim 1 -> base 2, sigma = identity -> plain van der Corput
    got = np.asarray(qmc.scr_halton(1, IDX))
    want = np.asarray(qmc.ri_vdc(IDX))
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_scr_halton_matches_scalar():
    def ref_scr(dim, n):
        base = int(qmc.PRIMES[dim])
        sigma = qmc._faure_permutation(base)
        v, f = 0.0, 1.0 / base
        while n:
            v += sigma[n % base] * f
            n //= base
            f /= base
        return min(1.0, max(1e-36, v))

    for dim in (2, 3, 5, 10, 25, 49):
        got = np.asarray(qmc.scr_halton(dim, IDX))
        want = np.array([ref_scr(dim, int(i)) for i in IDX], dtype=np.float32)
        np.testing.assert_allclose(got, want, atol=4e-7, err_msg=f"dim={dim}")


def test_scr_halton_uniformity():
    n = np.arange(1, 4097, dtype=np.uint32)
    for dim in (1, 2, 3, 7):
        x = np.asarray(qmc.scr_halton(dim, n))
        assert abs(x.mean() - 0.5) < 0.02
        assert x.min() >= 0.0 and x.max() <= 1.0
