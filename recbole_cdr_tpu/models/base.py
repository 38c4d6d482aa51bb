"""Abstract cross-domain recommender + shared functional building blocks.

Models here are *functional*: a model object holds only static configuration
(sizes, hyper-parameters, field names); parameters live in an explicit pytree
(dict of jnp arrays) created by ``init_params`` and threaded through pure
loss / scoring functions. This is what lets the trainer jit one program per
training phase, donate parameter buffers, and shard tables with
``NamedSharding`` without any module-system indirection.

Capability parity with ``CrossDomainRecommender``
(`recbole_cdr/model/crossdomain_recommender.py:14-51`) and recbole's
init/loss helpers (`recbole.model.init.xavier_normal_initialization`,
`recbole.model.loss.{EmbLoss, BPRLoss, RegLoss}`,
`recbole.model.layers.MLPLayers`).
"""

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.utils.enums import InputType, ModelType

Params = Dict[str, jnp.ndarray]


# ----------------------------------------------------------------- init utils

def xavier_normal(key, shape, dtype=jnp.float32):
    """Xavier/Glorot normal over the trailing two dims: std = sqrt(2/(d0+d1))."""
    fan_sum = shape[0] + shape[1] if len(shape) >= 2 else shape[0] * 2
    std = (2.0 / fan_sum) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def init_embedding(key, num, dim, dtype=jnp.float32):
    return xavier_normal(key, (num, dim), dtype)


def init_linear(key, d_in, d_out, dtype=jnp.float32):
    """Returns {'w': [d_in, d_out], 'b': [d_out]} with xavier-normal weight
    and zero bias (matching recbole's xavier_normal_initialization)."""
    return {
        "w": xavier_normal(key, (d_in, d_out), dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> List[dict]:
    layers = []
    keys = jax.random.split(key, max(len(sizes) - 1, 1))
    for i in range(len(sizes) - 1):
        layers.append(init_linear(keys[i], sizes[i], sizes[i + 1], dtype))
    return layers


def zero_rows(table: jnp.ndarray, start: int, end: int) -> jnp.ndarray:
    """Zero-fill rows [start, end) — the reference's trick for blanking the
    sections of a unified table that don't belong to a domain
    (e.g. `conet.py:65-70`)."""
    return table.at[start:end].set(0.0)


# ------------------------------------------------------------------- layers

def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def mlp_forward(layers: List[dict], x: jnp.ndarray, activation=jax.nn.relu,
                final_activation=True) -> jnp.ndarray:
    """MLP with the given activation after every layer (recbole ``MLPLayers``
    applies the activation after each Linear)."""
    for i, p in enumerate(layers):
        x = linear(p, x)
        if final_activation or i < len(layers) - 1:
            x = activation(x)
    return x


# -------------------------------------------------------------------- losses

def weighted_mean(values: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Mean over real (unpadded) samples: sum(v*w)/sum(w). Accumulates in
    f32 so bf16 compute keeps full-precision loss reductions."""
    values = values.astype(jnp.float32)
    weight = weight.astype(jnp.float32)
    return jnp.sum(values * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on logits (== BCELoss(sigmoid(x), y), stable)."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return weighted_mean(per, weight)


def bpr_loss(pos_score: jnp.ndarray, neg_score: jnp.ndarray, weight: jnp.ndarray,
             gamma: float = 1e-10) -> jnp.ndarray:
    """-log(gamma + sigmoid(pos - neg)), recbole ``BPRLoss`` semantics."""
    per = -jnp.log(gamma + jax.nn.sigmoid(pos_score - neg_score))
    return weighted_mean(per, weight)


def emb_loss(embeddings: Sequence[jnp.ndarray], weight: jnp.ndarray,
             norm: int = 2, require_pow: bool = False) -> jnp.ndarray:
    """recbole ``EmbLoss``: sum_i ||E_i||_p [/ p if require_pow] / batch_size,
    restricted to real (unpadded) rows via ``weight``."""
    weight = weight.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(weight), 1.0)
    total = 0.0
    for e in embeddings:
        w = weight.reshape((-1,) + (1,) * (e.ndim - 1))
        masked = e.astype(jnp.float32) * w  # f32 accumulation under bf16 compute
        if require_pow:
            total = total + jnp.sum(jnp.abs(masked) ** norm) / norm
        else:
            total = total + jnp.sum(jnp.abs(masked) ** norm) ** (1.0 / norm)
    return total / denom


def reg_loss(weights: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """recbole ``RegLoss``: sum of L2 norms of parameter tensors."""
    total = 0.0
    for w in weights:
        w = w.astype(jnp.float32)
        total = total + jnp.sqrt(jnp.sum(w * w))
    return total


# ---------------------------------------------------------------- base class

class CrossDomainRecommender:
    """Holds the domain field names and the eight ID-space counts every model
    uses, plus the phase hook (reference `crossdomain_recommender.py:21-51`)."""

    # NOTE: no class-level ``input_type`` here — models that omit it fall back
    # to the config's ``loss_type`` (the reference's EMCDR path,
    # `configurator.py:153-165`).
    type = ModelType.CROSSDOMAIN

    def __init__(self, config, dataset):
        self.config = config

        self.SOURCE_USER_ID = dataset.source_domain_dataset.uid_field
        self.SOURCE_ITEM_ID = dataset.source_domain_dataset.iid_field
        self.SOURCE_NEG_ITEM_ID = config["source_domain"]["NEG_PREFIX"] + self.SOURCE_ITEM_ID
        self.SOURCE_LABEL = dataset.source_domain_dataset.label_field
        self.source_num_users = dataset.source_domain_dataset.num(self.SOURCE_USER_ID)
        self.source_num_items = dataset.source_domain_dataset.num(self.SOURCE_ITEM_ID)

        self.TARGET_USER_ID = dataset.target_domain_dataset.uid_field
        self.TARGET_ITEM_ID = dataset.target_domain_dataset.iid_field
        self.TARGET_NEG_ITEM_ID = config["target_domain"]["NEG_PREFIX"] + self.TARGET_ITEM_ID
        self.TARGET_LABEL = dataset.target_domain_dataset.label_field
        self.target_num_users = dataset.target_domain_dataset.num(self.TARGET_USER_ID)
        self.target_num_items = dataset.target_domain_dataset.num(self.TARGET_ITEM_ID)

        self.total_num_users = dataset.num_total_user
        self.total_num_items = dataset.num_total_item
        self.overlapped_num_users = dataset.num_overlap_user
        self.overlapped_num_items = dataset.num_overlap_item

        self.OVERLAP_ID = dataset.overlap_id_field
        self.phase = None
        #: generation counter for host-side eval caches (e.g. BiTGCF's
        #: propagated-embedding cache). The trainer bumps it whenever it
        #: installs a new parameter pytree; caches MUST key on this counter,
        #: never on ``id(params)`` (CPython recycles ids after GC).
        self.params_version = 0

    # -- phase machinery ----------------------------------------------------

    def set_phase(self, phase: str):
        """Host-side phase switch (default no-op beyond recording)."""
        self.phase = phase

    def notify_params_updated(self):
        """Invalidate host-side eval caches. Called by the trainer every time
        it installs a new parameter pytree (``trainer.params`` setter)."""
        self.params_version += 1

    def mutate_params_on_phase(self, params: Params, phase: str) -> Params:
        """Optional parameter surgery on phase entry (e.g. DCDCSR's benchmark
        embedding build). Default: identity."""
        return params

    def augment_batch(self, batch: dict, phase: str) -> dict:
        """Host-side batch augmentation hook before device transfer (e.g.
        SSCDR's semi-supervised neighbor sampling, DCDCSR's map-batch index
        draw). Default: identity."""
        return batch

    def sparse_spec(self, phase: str):
        """Optional row-sparse optimizer support (``phase_optimizer: sparse``,
        trainer.SparseAdam): ``{param_name: [batch_key, ...]}`` mapping each
        embedding-table entry to the batch fields whose ids index it in this
        phase's loss. Declaring a table here asserts the phase's loss touches
        it ONLY through those batch ids (no full-table reads) — the device
        loop then takes grads wrt the gathered rows and updates only touched
        rows. ``None`` (default): unsupported; the trainer falls back to the
        dense optimizer for the phase."""
        return None

    def needs_host_augment(self, phase: str) -> bool:
        """True when this phase requires the host ``augment_batch`` hook —
        such phases stay on the host batch path instead of the
        device-resident epoch loop."""
        return False

    def scoring_cache_key(self, phase: str):
        """Key under which the trainer caches the jitted full-sort program for
        a phase. Models whose scoring changes within a named phase (DCDCSR's
        second TARGET pass) must extend this."""
        return phase

    def trainable_predicate(self, phase: str):
        """Returns f(param_name) -> bool: whether a top-level param entry is
        trainable in this phase. Default: everything trainable."""
        return lambda name: True

    # -- functional contract ------------------------------------------------

    def init_params(self, rng) -> Params:
        raise NotImplementedError

    def loss_fn(self, phase: str):
        """Returns a pure ``(params, batch, rng) -> scalar`` loss for the
        phase (``rng`` drives dropout and other in-graph randomness; models
        that need none ignore it)."""
        raise NotImplementedError

    def predict_fn(self):
        """Returns pure ``(params, batch) -> scores`` on target (user,item) pairs."""
        raise NotImplementedError

    def full_sort_factors(self, phase: str = "TARGET"):
        """Optional: ``(params, user_ids[B]) -> (user_repr [B, D],
        item_repr [item_space, D])`` for models whose full-sort score is a
        plain dot product. Enables the streaming (tiled) top-k evaluator for
        large item spaces without materializing [B, items] scores."""
        return None

    def full_sort_fn(self, phase: str = "TARGET"):
        """Returns pure ``(params, user_ids[B]) -> scores[B, item_space]``.

        The item axis depends on the phase: target phases score the contiguous
        target prefix ``[0, target_num_items)``; a SOURCE phase scores the
        compacted source item space (overlap prefix ++ source-only suffix).
        Models without a native full-sort path return None and the trainer
        falls back to blocked ``predict_fn`` scoring."""
        return None
