"""RNN-T loss vs independent numpy DP oracle + chunked-gather equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.ops import rnnt


def numpy_rnnt_oracle(logp, labels, T, U, blank=0):
    """Straight-line O(T*U) DP in float64."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t == 0 and u == 0:
                continue
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else -np.inf
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


def _rand_case(key, B=3, T=7, U=4, V=6):
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (B, T, U + 1, V))
    labels = jax.random.randint(k2, (B, U), 1, V)
    t_lens = jnp.asarray([T, T - 2, T - 1][:B])
    u_lens = jnp.asarray([U, U - 1, U - 2][:B])
    return logits, labels, t_lens, u_lens


def test_dense_loss_matches_numpy_oracle():
    logits, labels, t_lens, u_lens = _rand_case(jax.random.PRNGKey(0))
    loss = np.asarray(rnnt.rnnt_loss_dense(logits, labels, t_lens, u_lens))
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for b in range(logits.shape[0]):
        want = numpy_rnnt_oracle(
            logp[b], np.asarray(labels[b]), int(t_lens[b]), int(u_lens[b])
        )
        np.testing.assert_allclose(loss[b], want, rtol=1e-4, atol=1e-4)


def test_loss_is_proper_negative_log_likelihood():
    """Sum of path probabilities over ALL alignments == exp(-loss) on a tiny
    exhaustive case."""
    import itertools

    T, U, V = 3, 2, 4
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (1, T, U + 1, V))
    labels = jnp.asarray([[2, 3]])
    labels_np = np.asarray(labels)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
    total = -np.inf
    # enumerate monotone paths: sequence of T blanks and U labels
    for positions in itertools.combinations(range(T + U - 1), U):
        # path of moves; simulate
        t, u, lp, ok = 0, 0, 0.0, True
        for i in range(T + U):
            if t == T - 1 and u == U and i == T + U - 1:
                break
            is_label = i in positions
            if is_label:
                if u >= U:
                    ok = False
                    break
                lp += logp[t, u, labels_np[0, u]]
                u += 1
            else:
                lp += logp[t, u, 0]
                t += 1
                if t >= T:
                    ok = False
                    break
        if ok and t == T - 1 and u == U:
            lp += logp[T - 1, U, 0]  # final blank
            total = np.logaddexp(total, lp)
    loss = float(rnnt.rnnt_loss_dense(logits, labels, jnp.asarray([T]),
                                      jnp.asarray([U]))[0])
    np.testing.assert_allclose(-loss, total, rtol=1e-4)


def test_chunked_gather_matches_dense():
    B, T, U, V, J = 2, 11, 3, 8, 5
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    enc_p = jax.random.normal(ks[0], (B, T, J))
    pred_p = jax.random.normal(ks[1], (B, U + 1, J))
    W = jax.random.normal(ks[2], (J, V)) * 0.5

    def joint_fn(e, p):
        return jnp.tanh(e + p) @ W

    labels = jax.random.randint(ks[3], (B, U), 1, V)
    lab, blank = rnnt.gather_rnnt_logprobs_chunked(
        enc_p, pred_p, labels, joint_fn, t_chunk=4
    )
    logits = joint_fn(enc_p[:, :, None, :], pred_p[:, None, :, :])
    logp = jax.nn.log_softmax(logits, axis=-1)
    want_blank = np.asarray(logp[..., 0])
    labels_ext = jnp.concatenate([labels, jnp.zeros((B, 1), labels.dtype)], 1)
    want_lab = np.asarray(jnp.take_along_axis(
        logp, labels_ext[:, None, :, None], axis=-1)[..., 0])
    np.testing.assert_allclose(np.asarray(blank), want_blank, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lab), want_lab, rtol=1e-5,
                               atol=1e-5)


def test_rnnt_grads_finite():
    logits, labels, t_lens, u_lens = _rand_case(jax.random.PRNGKey(3))

    def f(lg):
        return jnp.mean(rnnt.rnnt_loss_dense(lg, labels, t_lens, u_lens))

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
