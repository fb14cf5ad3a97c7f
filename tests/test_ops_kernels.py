"""Conformance tests for the fused Pallas TPU kernels (ops/kernels.py) in
interpreter mode, validated bit-exactly against the spec layer.

VERDICT r2 item 5: the 1.1k-line perf core previously had zero CI coverage
(bit-exactness was only checked by uncommitted scripts on the live TPU).
These run every public kernel wrapper under ROFL_PALLAS=interp at small
shapes; the reference analogue is the inline #[cfg(test)] coverage of every
dalek/bulletproofs crypto module (SURVEY.md §4.1).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rofl_tpu.ops import fe, kernels, sc
from rofl_tpu.spec import ristretto as SR
from rofl_tpu.spec import scalar as SS

pytestmark = pytest.mark.slow

N = 8
rng = np.random.default_rng(99)


@pytest.fixture(autouse=True, scope="module")
def _interp_mode():
    # interpret=_interpret() is baked in at trace time and jax.jit caches
    # are not keyed on the env var — clear the caches on both sides so a
    # wrapper traced earlier at the same shapes can't leak a stale
    # non-interp executable in (or out of) this module (ADVICE r3).
    import jax

    old = os.environ.get("ROFL_PALLAS")
    os.environ["ROFL_PALLAS"] = "interp"
    jax.clear_caches()
    yield
    if old is None:
        os.environ.pop("ROFL_PALLAS", None)
    else:
        os.environ["ROFL_PALLAS"] = old
    jax.clear_caches()


def rand_scalars(n):
    return [int.from_bytes(rng.bytes(64), "little") % SS.L for _ in range(n)]


def rand_points(n):
    return [SR.BASEPOINT.scalar_mul(k) for k in rand_scalars(n)]


def pack_pts(pts):
    return tuple(
        jnp.asarray(fe.pack_scalars([getattr(p, c) for p in pts]))
        for c in "XYZT"
    )


def unpack_pts(arrs):
    coords = [fe.unpack_scalars(np.asarray(a)) for a in arrs]
    return [SR.RistrettoPoint(*c) for c in zip(*coords)]


def assert_points_equal(got_arrs, want_pts):
    got = unpack_pts(got_arrs)
    assert len(got) == len(want_pts)
    for g, w in zip(got, want_pts):
        assert g.compress() == w.compress()


def test_point_add_double():
    ps = rand_points(N)
    qs = rand_points(N)
    pa, qa = pack_pts(ps), pack_pts(qs)
    assert_points_equal(kernels.point_add(pa, qa),
                        [p + q for p, q in zip(ps, qs)])
    assert_points_equal(kernels.point_double(pa), [p + p for p in ps])
    # identity handling (unified formulas)
    ident = pack_pts([SR.identity()] * N)
    assert_points_equal(kernels.point_add(pa, ident), ps)


def test_scalar_mul():
    ps = rand_points(N)
    ks = rand_scalars(N)
    got = kernels.scalar_mul(pack_pts(ps), jnp.asarray(sc.pack_scalars(ks)))
    assert_points_equal(got, [p.scalar_mul(k) for p, k in zip(ps, ks)])


def test_shared_scalar_mul():
    ps = rand_points(N)
    k = rand_scalars(1)[0]
    got = kernels.shared_scalar_mul(
        pack_pts(ps), jnp.asarray(sc.pack_scalars([k])))
    assert_points_equal(got, [p.scalar_mul(k) for p in ps])


def test_msm_flat_and_groups():
    ps = rand_points(N)
    ks = rand_scalars(N)
    karr = jnp.asarray(sc.pack_scalars(ks))
    want = SR.identity()
    for p, k in zip(ps, ks):
        want = want + p.scalar_mul(k)
    assert_points_equal(kernels.msm_flat(pack_pts(ps), karr), [want])

    # grouped: the wrapper requires group >= 128; exercise the routing
    # fallback via ops.msm instead at group 4
    from rofl_tpu.ops import msm as msm_mod
    from rofl_tpu.ops.curve import PointArray

    out = msm_mod.msm_grouped(PointArray(*pack_pts(ps)), karr, 4)
    wants = []
    for g in range(N // 4):
        acc = SR.identity()
        for p, k in zip(ps[4 * g:4 * g + 4], ks[4 * g:4 * g + 4]):
            acc = acc + p.scalar_mul(k)
        wants.append(acc)
    assert_points_equal(tuple(out), wants)


def test_tree_sum_and_groups():
    ps = rand_points(N)
    acc = SR.identity()
    for p in ps:
        acc = acc + p
    assert_points_equal(kernels.tree_sum(pack_pts(ps)), [acc])

    out = kernels.tree_sum_groups(pack_pts(ps), 4)
    wants = []
    for g in range(N // 4):
        a = SR.identity()
        for p in ps[4 * g:4 * g + 4]:
            a = a + p
        wants.append(a)
    assert_points_equal(tuple(out), wants)


def test_compress_decompress():
    ps = rand_points(N)
    pa = pack_pts(ps)
    comp = kernels.compress(pa)
    want_bytes = [p.compress() for p in ps]
    got_bytes = fe.to_bytes_array(np.asarray(comp))
    assert [bytes(b) for b in got_bytes] == want_bytes

    pts, valid = kernels.decompress(comp)
    assert bool(np.asarray(valid).all())
    assert_points_equal(pts, ps)

    # an invalid encoding must be rejected (s with no square root branch)
    bad = np.asarray(comp).copy()
    bad[0, 0] ^= 1
    enc = fe.to_bytes_array(bad)[0]
    if SR.decompress(bytes(enc)) is None:
        _, valid = kernels.decompress(jnp.asarray(bad))
        assert not bool(np.asarray(valid)[0])


def test_sc_kernels():
    a = rand_scalars(N)
    b = rand_scalars(N)
    aa = jnp.asarray(sc.pack_scalars(a))
    bb = jnp.asarray(sc.pack_scalars(b))
    got_mul = sc.unpack_scalars(np.asarray(kernels.sc_mul(aa, bb)))
    assert got_mul == [(x * y) % SS.L for x, y in zip(a, b)]
    got_add = sc.unpack_scalars(np.asarray(kernels.sc_add(aa, bb)))
    assert got_add == [(x + y) % SS.L for x, y in zip(a, b)]
    got_sub = sc.unpack_scalars(np.asarray(kernels.sc_sub(aa, bb)))
    assert got_sub == [(x - y) % SS.L for x, y in zip(a, b)]


def test_sc_reduce_wide():
    raw = rng.integers(0, 256, size=(N, 64), dtype=np.uint8)
    cols = jnp.asarray(np.ascontiguousarray(raw.T).astype(np.uint32))
    got = sc.unpack_scalars(np.asarray(kernels.sc_reduce_wide(cols)))
    want = [int.from_bytes(raw[i].tobytes(), "little") % SS.L
            for i in range(N)]
    assert got == want


def test_sc_sum_groups():
    a = rand_scalars(N)
    aa = jnp.asarray(sc.pack_scalars(a))
    out = kernels.sc_sum_groups(aa, 4)
    got = sc.unpack_scalars(np.asarray(out))
    want = [sum(a[4 * g:4 * g + 4]) % SS.L for g in range(N // 4)]
    assert got == want
