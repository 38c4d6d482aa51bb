"""Hand-computed golden values for the shared loss primitives and the CMF
objective — pins the numerics the models are built from (recbole-equivalent
EmbLoss / BPRLoss / BCE semantics)."""

import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.models.base import bce_loss, bpr_loss, emb_loss, reg_loss, weighted_mean


def test_weighted_mean_ignores_padding():
    v = jnp.array([1.0, 2.0, 3.0, 999.0])
    w = jnp.array([1.0, 1.0, 1.0, 0.0])
    assert float(weighted_mean(v, w)) == 2.0


def test_bce_matches_numpy():
    logits = np.array([0.5, -1.0, 2.0])
    labels = np.array([1.0, 0.0, 1.0])
    w = np.ones(3)
    p = 1 / (1 + np.exp(-logits))
    expect = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
    got = float(bce_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_bpr_matches_reference_formula():
    pos = np.array([1.0, 0.5])
    neg = np.array([0.2, 0.9])
    gamma = 1e-10
    expect = -np.log(gamma + 1 / (1 + np.exp(-(pos - neg)))).mean()
    got = float(bpr_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.ones(2)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_emb_loss_is_norm_over_batch():
    # recbole EmbLoss default: sum_i ||E_i||_2 / batch_size
    e1 = np.array([[3.0, 4.0], [0.0, 0.0]])  # frobenius norm 5
    e2 = np.array([[1.0, 0.0], [0.0, 0.0]])  # norm 1
    w = np.ones(2)
    got = float(emb_loss([jnp.asarray(e1), jnp.asarray(e2)], jnp.asarray(w)))
    np.testing.assert_allclose(got, (5.0 + 1.0) / 2, rtol=1e-6)


def test_emb_loss_require_pow():
    e = np.array([[3.0, 4.0]])
    got = float(emb_loss([jnp.asarray(e)], jnp.ones(1), require_pow=True))
    np.testing.assert_allclose(got, (25.0) / 2 / 1, rtol=1e-6)  # ||e||^2/2/B


def test_reg_loss_sums_norms():
    w1 = np.array([[3.0, 4.0]])
    w2 = np.array([[0.0, 2.0]])
    got = float(reg_loss([jnp.asarray(w1), jnp.asarray(w2)]))
    np.testing.assert_allclose(got, 5.0 + 2.0, rtol=1e-6)


def test_cmf_loss_golden():
    """CMF objective on a constructed 2-example batch vs numpy."""

    class FakeDomain:
        def __init__(self, prefix):
            self.uid_field = f"{prefix}_user_id"
            self.iid_field = f"{prefix}_item_id"
            self.label_field = f"{prefix}_label"

        def num(self, f):
            return 4

    class FakeDS:
        source_domain_dataset = FakeDomain("source")
        target_domain_dataset = FakeDomain("target")
        num_total_user = 4
        num_total_item = 4
        num_overlap_user = 1
        num_overlap_item = 2
        overlap_id_field = "overlap"

    class Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    cfg = Cfg(
        embedding_size=2, alpha=0.6, **{"lambda": 0.1}, gamma=0.2,
        source_domain={"NEG_PREFIX": "neg_"}, target_domain={"NEG_PREFIX": "neg_"},
    )
    from recbole_cdr_tpu.models.cmf import CMF

    m = CMF(cfg, FakeDS())
    U = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.5, 0.5]])
    V = np.array([[1.0, 1.0], [2.0, 0.0], [0.0, 2.0], [1.0, 0.0]])
    params = {"user_embedding": jnp.asarray(U), "item_embedding": jnp.asarray(V)}
    batch = {
        "source_user_id": jnp.array([1, 2]),
        "source_item_id": jnp.array([1, 3]),
        "source_label": jnp.array([1.0, 0.0]),
        "source_sample_weight": jnp.ones(2),
        "target_user_id": jnp.array([3, 0]),
        "target_item_id": jnp.array([2, 1]),
        "target_label": jnp.array([1.0, 0.0]),
        "target_sample_weight": jnp.ones(2),
    }
    got = float(m.loss_fn("BOTH")(params, batch))

    def bce(logit, y):
        p = 1 / (1 + np.exp(-logit))
        return -(y * np.log(p) + (1 - y) * np.log(1 - p))

    s_logits = np.array([U[1] @ V[1], U[2] @ V[3]])
    t_logits = np.array([U[3] @ V[2], U[0] @ V[1]])
    loss_s = bce(s_logits, np.array([1.0, 0.0])).mean() + 0.1 * (
        (np.linalg.norm(U[[1, 2]]) + np.linalg.norm(V[[1, 3]])) / 2
    )
    loss_t = bce(t_logits, np.array([1.0, 0.0])).mean() + 0.2 * (
        (np.linalg.norm(U[[3, 0]]) + np.linalg.norm(V[[2, 1]])) / 2
    )
    expect = 0.6 * loss_s + 0.4 * loss_t
    np.testing.assert_allclose(got, expect, rtol=1e-5)
