import jax
import jax.numpy as jnp
import numpy as np

from ppl.llm.serving_tpu.ops import sampling as S


def make_params(b, **kw):
    base = dict(
        temperature=jnp.ones(b), top_k=jnp.zeros(b, jnp.int32),
        top_p=jnp.zeros(b), do_sample=jnp.ones(b, bool),
        repetition_penalty=jnp.ones(b), presence_penalty=jnp.zeros(b),
        frequency_penalty=jnp.zeros(b),
    )
    for k, v in kw.items():
        base[k] = v
    return S.SamplingParams(**base)


def test_greedy():
    logits = jnp.array([[0.1, 5.0, 0.2, 0.3], [9.0, 0.0, 0.0, 0.0]])
    p = make_params(2, do_sample=jnp.zeros(2, bool))
    toks, lp = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(toks, [1, 0])
    expected = jax.nn.log_softmax(logits)[jnp.arange(2), toks]
    np.testing.assert_allclose(lp, expected, rtol=1e-3)


def test_top_k_restricts_support():
    logits = jnp.array([[3.0, 2.0, 1.0, 0.0, -1.0]] * 64)
    p = make_params(64, top_k=jnp.full(64, 2, jnp.int32))
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(1))
    assert set(np.asarray(toks).tolist()) <= {0, 1}


def test_top_p_keeps_top_token_when_tiny():
    logits = jnp.array([[2.0, 1.0, 0.0]] * 8)
    p = make_params(8, top_p=jnp.full(8, 1e-6))
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(toks, np.zeros(8))


def test_top_p_mass():
    # probs ~ [0.64, 0.23, 0.09, 0.03]; top_p=0.7 keeps first two
    logits = jnp.log(jnp.array([[0.64, 0.23, 0.09, 0.03]] * 256))
    p = make_params(256, top_p=jnp.full(256, 0.7))
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(3))
    assert set(np.asarray(toks).tolist()) <= {0, 1}


def test_temperature_flattens():
    logits = jnp.array([[2.0, 0.0]] * 2000)
    hot = make_params(2000, temperature=jnp.full(2000, 100.0))
    toks, _ = S.sample_top_k_top_p(logits, hot, jax.random.PRNGKey(4))
    frac = np.mean(np.asarray(toks) == 0)
    assert 0.4 < frac < 0.6  # near-uniform at high temperature


def test_sampling_distribution_matches():
    probs = np.array([0.5, 0.3, 0.2])
    logits = jnp.log(jnp.tile(probs, (4000, 1)))
    p = make_params(4000)
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(5))
    counts = np.bincount(np.asarray(toks), minlength=3) / 4000
    np.testing.assert_allclose(counts, probs, atol=0.04)


def test_per_row_params_independent():
    logits = jnp.array([[1.0, 0.9, 0.1], [1.0, 0.9, 0.1]])
    p = make_params(
        2,
        top_k=jnp.array([1, 0], jnp.int32),
        do_sample=jnp.array([True, False]),
    )
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(6))
    assert toks[0] == 0  # top_k=1 forces argmax even when sampling


class TestPenalties:
    def test_count_map_update(self):
        cm = S.init_count_map(num_slots=4, vocab_size=8)
        assert cm.shape == (5, 8)
        cm = S.update_count_map(cm, jnp.array([1, 1, 3]),
                                jnp.array([0, 0, 2]))
        assert cm[0, 1] == 2 and cm[2, 3] == 1
        cm = S.clear_count_slots(cm, jnp.array([0]))
        assert cm[0, 1] == 0 and cm[2, 3] == 1

    def test_repetition_penalty(self):
        cm = S.init_count_map(2, 4)
        cm = S.update_count_map(cm, jnp.array([0, 2]), jnp.array([0, 0]))
        logits = jnp.array([[2.0, 1.0, -1.0, 0.5]])
        p = make_params(1, repetition_penalty=jnp.array([2.0]))
        out = S.apply_penalties(logits, cm, jnp.array([0]), p)
        np.testing.assert_allclose(out[0], [1.0, 1.0, -2.0, 0.5], rtol=1e-6)

    def test_presence_frequency(self):
        cm = S.init_count_map(2, 4)
        cm = S.update_count_map(cm, jnp.array([1, 1, 1]),
                                jnp.array([0, 0, 0]))
        logits = jnp.zeros((1, 4))
        p = make_params(1, presence_penalty=jnp.array([0.5]),
                        frequency_penalty=jnp.array([0.25]))
        out = S.apply_penalties(logits, cm, jnp.array([0]), p)
        # token 1: -0.5 (presence) - 3*0.25 (frequency)
        np.testing.assert_allclose(out[0], [0, -1.25, 0, 0], rtol=1e-6)

    def test_penalty_slot_isolation(self):
        cm = S.init_count_map(2, 4)
        cm = S.update_count_map(cm, jnp.array([1]), jnp.array([0]))
        logits = jnp.zeros((2, 4))
        p = make_params(2, presence_penalty=jnp.full(2, 1.0))
        out = S.apply_penalties(logits, cm, jnp.array([0, 1]), p)
        assert out[0, 1] == -1.0 and out[1, 1] == 0.0


def test_top_k_cap_greedy_exact():
    """approx_max_k path must stay EXACT for greedy (argmax patched in)."""
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(key, (64, 32000)) * 3
    p = make_params(64, do_sample=jnp.zeros(64, bool))
    t_full, lp_full = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(0),
                                           top_k_cap=0)
    t_cap, lp_cap = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(0),
                                         top_k_cap=256)
    np.testing.assert_array_equal(t_cap, t_full)
    np.testing.assert_allclose(lp_cap, lp_full, rtol=1e-4)


def test_top_k_cap_sampling_support():
    """cap path respects per-row top_k restriction."""
    logits = jnp.tile(jnp.array([5.0, 4.0, 3.0] + [0.0] * 997), (128, 1))
    p = make_params(128, top_k=jnp.full(128, 2, jnp.int32))
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(1),
                                   top_k_cap=64)
    assert set(np.asarray(toks).tolist()) <= {0, 1}


def test_greedy_only_fast_path_matches_general():
    """The static greedy_only variant must match the general path
    token-for-token and logprob-for-logprob on all-greedy batches."""
    key = jax.random.PRNGKey(11)
    logits = jax.random.normal(key, (32, 4096)) * 3
    p = make_params(32, do_sample=jnp.zeros(32, bool),
                    temperature=jnp.full(32, 0.7))
    t_gen, lp_gen = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(0),
                                         top_k_cap=256)
    t_fast, lp_fast = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(0),
                                           top_k_cap=256, greedy_only=True)
    np.testing.assert_array_equal(t_fast, t_gen)
    np.testing.assert_allclose(lp_fast, lp_gen, rtol=1e-4)


def test_sampled_distribution_chi2_vs_reference():
    """Chi-square goodness-of-fit of the capped sampling path against
    the reference's EXACT top-k/top-p semantics computed in numpy
    (post_processor.cc:121-219: temperature -> top-k -> top-p with
    exclusive-cumsum keep rule -> renormalize -> categorical)."""
    from scipy import stats

    rng = np.random.RandomState(7)
    v, cap, k, top_p, temp = 512, 64, 40, 0.9, 0.8
    logits_row = rng.randn(v).astype(np.float32) * 2.0

    # reference distribution, exact, in numpy
    scaled = logits_row / temp
    order = np.argsort(-scaled)
    keep = np.zeros(v, bool)
    keep[order[:k]] = True                       # top-k
    probs = np.exp(scaled - scaled.max())
    probs /= probs.sum()
    sp = probs[order]
    cum_before = np.cumsum(sp) - sp              # exclusive cumsum
    keep_p = np.zeros(v, bool)
    keep_p[order] = cum_before < top_p           # top-p keep rule
    keep &= keep_p
    ref = np.where(keep, probs, 0.0)
    ref /= ref.sum()

    n = 1 << 14
    logits = jnp.asarray(np.tile(logits_row, (n, 1)))
    p = make_params(n,
                    temperature=jnp.full(n, temp),
                    top_k=jnp.full(n, k, jnp.int32),
                    top_p=jnp.full(n, top_p))
    toks, _ = S.sample_top_k_top_p(logits, p, jax.random.PRNGKey(11),
                                   top_k_cap=cap)
    toks = np.asarray(toks)
    assert set(toks.tolist()) <= set(np.where(keep)[0].tolist())

    support = np.where(ref > 0)[0]
    counts = np.bincount(toks, minlength=v)[support]
    expected = ref[support] * n
    # merge tail cells so every expected count >= 5 (chi2 validity)
    big = expected >= 5
    obs = np.concatenate([counts[big], [counts[~big].sum()]]) \
        if (~big).any() else counts[big]
    exp = np.concatenate([expected[big], [expected[~big].sum()]]) \
        if (~big).any() else expected[big]
    exp = exp * obs.sum() / exp.sum()
    stat = float(((obs - exp) ** 2 / exp).sum())
    pval = float(stats.chi2.sf(stat, df=len(obs) - 1))
    assert pval > 1e-4, (stat, pval)
