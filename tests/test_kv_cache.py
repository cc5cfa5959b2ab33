import jax
import jax.numpy as jnp
import numpy as np

from ppl.llm.serving_tpu.ops import kv_cache as kv_ops
from ppl.llm.serving_tpu.ops.kv_cache import CacheSpec


def make_spec(**kw):
    base = dict(num_layers=2, num_pages=8, page_size=4, num_kv_heads=2,
                head_dim=8, dtype=jnp.float32)
    base.update(kw)
    return CacheSpec(**base)


def test_init_shapes():
    spec = make_spec()
    cache, scale = kv_ops.init_cache(spec)
    # stacked [L, KVH, slots, 2*shd] packed k|v rows: head-major so a
    # (head, page) tile is one contiguous [page_size, 2*shd] block
    assert cache.shape == (2, 2 * 9 * 4, 16)
    assert scale is None
    qspec = make_spec(quant_bit=8, quant_group=8)
    cache, scale = kv_ops.init_cache(qspec)
    assert cache.dtype == jnp.int8
    # packed-row scales [L, slots, lanes]: lane order (head, k|v, group)
    # padded to 128 so writes are dense row scatters and kernel page
    # DMAs slice a 128-aligned minor dim
    assert scale.shape == (2 * 9 * 4, 128)


def test_storage_head_dim_padding():
    spec = make_spec(storage_head_dim=64)
    cache, _ = kv_ops.init_cache(spec)
    assert cache.shape[-1] == 128  # [k(64) | v(64)] packed row
    k = jax.random.normal(jax.random.PRNGKey(9), (3, 2, 8))
    pt = jnp.array([[4]], jnp.int32)
    slots = kv_ops.token_slots(pt, jnp.arange(3), jnp.zeros(3, jnp.int32),
                               spec.page_size)
    cache, _ = kv_ops.append_kv(cache, None, k, k, slots, spec)
    # padded lanes stay zero; logical lanes round-trip
    gk, _ = kv_ops.gather_pages(cache, None, pt, spec, jnp.float32)
    np.testing.assert_allclose(gk[0, :3], k, rtol=1e-6)
    assert float(jnp.abs(cache[:, :, 8:64]).max()) == 0.0
    assert float(jnp.abs(cache[:, :, 64 + 8:]).max()) == 0.0


def test_token_slots():
    spec = make_spec()
    pt = jnp.array([[5, 6, spec.trash_page],
                    [2, spec.trash_page, spec.trash_page]], jnp.int32)
    pos = jnp.array([0, 3, 4, 1], jnp.int32)
    rows = jnp.array([0, 0, 0, 1], jnp.int32)
    slots = kv_ops.token_slots(pt, pos, rows, spec.page_size)
    np.testing.assert_array_equal(slots, [20, 23, 24, 9])


def test_append_and_gather_roundtrip():
    spec = make_spec()
    cache, scale = kv_ops.init_cache(spec)
    key = jax.random.PRNGKey(0)
    t = 6
    k = jax.random.normal(key, (t, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(1), (t, 2, 8))
    # one sequence occupying pages [3, 1], positions 0..5
    pt = jnp.array([[3, 1]], jnp.int32)
    pos = jnp.arange(t, dtype=jnp.int32)
    rows = jnp.zeros(t, jnp.int32)
    slots = kv_ops.token_slots(pt, pos, rows, spec.page_size)
    cache, _ = kv_ops.append_kv(cache, None, k, v, slots, spec, layer=1)
    gk, gv = kv_ops.gather_pages(cache, None, pt, spec, dtype=jnp.float32,
                                 layer=1)
    np.testing.assert_allclose(gk[0, :t], k, rtol=1e-6)
    np.testing.assert_allclose(gv[0, :t], v, rtol=1e-6)
    # the other layer is untouched
    assert float(jnp.abs(cache[:, :spec.num_slots]).max()) == 0.0


def test_append_block_matches_per_layer():
    """append_kv_block (the decode fast path's single fused scatter) must
    land exactly what per-layer append_kv lands."""
    for quant in (False, True):
        spec = (make_spec(quant_bit=8, quant_group=8, num_layers=3)
                if quant else make_spec(num_layers=3))
        t = 5
        ks = jax.random.normal(jax.random.PRNGKey(10), (3, t, 2, 8))
        vs = jax.random.normal(jax.random.PRNGKey(11), (3, t, 2, 8))
        pt = jnp.array([[3, 1]], jnp.int32)
        slots = kv_ops.token_slots(pt, jnp.arange(t), jnp.zeros(t, jnp.int32),
                                   spec.page_size)
        c1, s1 = kv_ops.init_cache(spec)
        for li in range(3):
            c1, s1 = kv_ops.append_kv(c1, s1, ks[li], vs[li], slots, spec,
                                      layer=li)
        c2, s2 = kv_ops.init_cache(spec)
        c2, s2 = kv_ops.append_kv_block(c2, s2, ks, vs, slots, spec)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        if quant:
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_page_contiguity():
    """The layout contract the Pallas kernels rely on: one (head, page)
    tile is contiguous [page_size, 2*shd] with k in the first half of
    each row and v in the second."""
    spec = make_spec()
    cache, _ = kv_ops.init_cache(spec)
    k = jnp.arange(4 * 2 * 8, dtype=jnp.float32).reshape(4, 2, 8)
    v = -k
    pt = jnp.array([[5]], jnp.int32)
    slots = kv_ops.token_slots(pt, jnp.arange(4), jnp.zeros(4, jnp.int32),
                               spec.page_size)
    cache, _ = kv_ops.append_kv(cache, None, k, v, slots, spec)
    # head h, layer 0, page 5 lives at cache[h, 20:24, :]
    for h in range(2):
        np.testing.assert_allclose(cache[h, 20:24, :8], k[:, h, :])
        np.testing.assert_allclose(cache[h, 20:24, 8:16], v[:, h, :])


def test_quantize_roundtrip_error():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (16, 4, 64))
    q, s = kv_ops.quantize_kv(x, 8)
    assert q.dtype == jnp.int8 and s.shape == (16, 4, 8)
    x2 = kv_ops.dequantize_kv(q, s, 8, dtype=jnp.float32)
    err = jnp.abs(x2 - x).max() / jnp.abs(x).max()
    assert err < 0.02  # int8 per-group-8 absmax quantization


def test_quantized_append_gather():
    spec = make_spec(quant_bit=8, quant_group=8)
    cache, scale = kv_ops.init_cache(spec)
    k = jax.random.normal(jax.random.PRNGKey(3), (4, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(4), (4, 2, 8))
    pt = jnp.array([[0, spec.trash_page]], jnp.int32)
    slots = kv_ops.token_slots(pt, jnp.arange(4), jnp.zeros(4, jnp.int32),
                               spec.page_size)
    cache, scale = kv_ops.append_kv(cache, scale, k, v, slots, spec)
    gk, gv = kv_ops.gather_pages(cache, scale, pt, spec, jnp.float32)
    np.testing.assert_allclose(gk[0, :4], k, atol=0.05)
    np.testing.assert_allclose(gv[0, :4], v, atol=0.05)


def test_trash_page_isolation():
    """Padding-token writes to the trash page must not disturb real pages."""
    spec = make_spec()
    cache, _ = kv_ops.init_cache(spec)
    k_real = jnp.ones((1, 2, 8))
    pt = jnp.array([[2, spec.trash_page]], jnp.int32)
    slots = kv_ops.token_slots(pt, jnp.array([0]), jnp.array([0]),
                               spec.page_size)
    cache, _ = kv_ops.append_kv(cache, None, k_real, k_real, slots, spec)
    # padding writes at positions mapping to the trash page
    k_junk = jnp.full((3, 2, 8), 99.0)
    junk_slots = kv_ops.token_slots(pt, jnp.array([4, 5, 6]),
                                    jnp.zeros(3, jnp.int32), spec.page_size)
    cache, _ = kv_ops.append_kv(cache, None, k_junk, k_junk, junk_slots, spec)
    gk, _ = kv_ops.gather_pages(cache, None, jnp.array([[2]], jnp.int32),
                                spec, jnp.float32)
    np.testing.assert_allclose(gk[0, 0], jnp.ones((2, 8)), rtol=1e-6)
    assert not jnp.any(gk[0, 1:] == 99.0)
