"""Module-level numerical parity of the non-default attention variants
against the actual torch reference classes (reference attention.py:25-289,
401-505), instantiated standalone with transferred weights.

The full-model parity suite covers only SMA (the default); these tests
close the gap for LSA / ForwardAttentionV2 / ContentAttention / DCA / GMM —
per-step context+weights allclose over several steps INCLUDING state
carry-over (DCA's alignment_pre, GMM's mu accumulator, ForwardV2's
log_alpha recursion).

CPU-compat shim: DCA.init_attention hardcodes ``.cuda()``
(reference attention.py:238) — ``torch.Tensor.cuda`` is patched to identity
for these tests, mirroring test_reference_parity's mask shim.

Documented divergence asserted here: the reference's ForwardAttentionV2
returns log_alpha_new commented out (attention.py:151), so its caller's
log_alpha never advances; our implementation propagates the forward
recursion.  Parity is therefore checked by feeding OUR carried log_alpha
into the torch module each step — module math identical, state wiring
repaired.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"

DIMS = dict(attention_rnn_dim=24, embedding_dim=32, attention_dim=12,
            attention_location_n_filters=4,
            attention_location_kernel_size=5)
B, T = 3, 11


@pytest.fixture(scope="module")
def ref_attention():
    from tests.test_reference_parity import _stub_librosa
    _stub_librosa()  # reference layers.py imports librosa at module scope
    sys.path.insert(0, REF)
    try:
        import attention as ref_att
    finally:
        sys.path.remove(REF)
    # CPU shim for DCA's hardcoded .cuda() (attention.py:238)
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    return ref_att


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _lin(mod):
    """torch LinearNorm / nn.Linear → our {'w' [in,out], 'b'?}."""
    lin = getattr(mod, "linear_layer", mod)
    p = {"w": jnp.asarray(lin.weight.detach().numpy().T)}
    if lin.bias is not None:
        p["b"] = jnp.asarray(lin.bias.detach().numpy())
    return p


def _inputs(seed):
    rng = np.random.RandomState(seed)
    memory = rng.randn(B, T, DIMS["embedding_dim"]).astype(np.float32)
    queries = rng.randn(6, B, DIMS["attention_rnn_dim"]).astype(np.float32)
    return memory, queries


def _run_parity(variant, ref_mod, params, memory, queries, atol=2e-5,
                mask=None):
    """Drive torch module + our functional step over len(queries) steps,
    asserting context/weights parity each step.  ``mask``: [B, T] bool,
    True = VALID (ours); the torch side gets the inverse (True = padded)."""
    from tacotron2_subword_tpu.models import attention as A

    pm_t = ref_mod.memory_layer(_t(memory)) \
        if hasattr(ref_mod, "memory_layer") else None
    pm_j = A.process_memory(params, jnp.asarray(memory))
    if hasattr(ref_mod, "init_attention") and pm_t is not None:
        ref_mod.init_attention(pm_t)

    state = A.init_state(variant, B, T)
    mask_j = None if mask is None else jnp.asarray(mask)
    mask_t = None if mask is None else _t(~mask).bool()
    prev_w = np.zeros((B, T), np.float32)
    cum_w = np.zeros((B, T), np.float32)
    log_alpha_t = None
    if variant == "ForwardAttentionV2":
        log_alpha_t = _t(np.asarray(state["log_alpha"]))

    for step, q in enumerate(queries):
        wcat = np.stack([prev_w, cum_w], axis=1)
        with torch.no_grad():
            ctx_t, w_t = ref_mod(
                _t(q), _t(memory), pm_t, _t(wcat), mask_t, log_alpha_t)
        ctx_j, w_j, state = A.attention_step(
            variant, params, jnp.asarray(q), jnp.asarray(memory), pm_j,
            jnp.asarray(wcat), mask_j, state)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(),
                                   atol=atol, err_msg=f"weights step {step}")
        np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(),
                                   atol=atol * 10,
                                   err_msg=f"context step {step}")
        prev_w = np.asarray(w_j)
        cum_w = cum_w + prev_w
        if variant == "ForwardAttentionV2":
            # repaired state wiring: carry OUR recursion into the torch
            # module (the reference's own return is commented out)
            log_alpha_t = _t(np.asarray(state["log_alpha"]))


def test_location_sensitive_parity(ref_attention):
    from tacotron2_subword_tpu.models import attention as A
    torch.manual_seed(0)
    ref = ref_attention.LocationSensitiveAttention(**DIMS).eval()
    params = {
        "memory": _lin(ref.memory_layer),
        "query": _lin(ref.query_layer),
        "v": _lin(ref.v),
        "loc_conv": {"w": jnp.asarray(
            ref.location_layer.location_conv.conv.weight.detach().numpy())},
        "loc_dense": _lin(ref.location_layer.location_dense),
    }
    memory, queries = _inputs(1)
    _run_parity("LocationSensitiveAttention", ref, params, memory, queries)
    # and with padding masked out
    mask = np.ones((B, T), bool)
    mask[1, 8:] = False
    mask[2, 5:] = False
    _run_parity("LocationSensitiveAttention", ref, params, memory, queries,
                mask=mask)


def test_forward_attention_v2_parity(ref_attention):
    torch.manual_seed(1)
    ref = ref_attention.ForwardAttentionV2(**DIMS).eval()
    params = {
        "memory": _lin(ref.memory_layer),
        "query": _lin(ref.query_layer),
        "v": _lin(ref.v),
        "loc_conv": {"w": jnp.asarray(
            ref.location_layer.location_conv.conv.weight.detach().numpy())},
        "loc_dense": _lin(ref.location_layer.location_dense),
    }
    memory, queries = _inputs(2)
    _run_parity("ForwardAttentionV2", ref, params, memory, queries)


def test_forward_attention_v2_reference_state_is_static(ref_attention):
    """The documented divergence itself: the torch module never hands back
    log_alpha (attention.py:151), so two reference calls with the caller's
    unchanged log_alpha produce identical weights — while our recursion
    advances them."""
    from tacotron2_subword_tpu.models import attention as A
    torch.manual_seed(1)
    ref = ref_attention.ForwardAttentionV2(**DIMS).eval()
    memory, queries = _inputs(3)
    pm_t = ref.memory_layer(_t(memory))
    la0 = np.full((B, T), -1e4, np.float32)
    la0[:, 0] = 0.0
    wcat = np.zeros((B, 2, T), np.float32)
    with torch.no_grad():
        _, w1 = ref(_t(queries[0]), _t(memory), pm_t, _t(wcat), None,
                    _t(la0))
        _, w2 = ref(_t(queries[0]), _t(memory), pm_t, _t(wcat), None,
                    _t(la0))
    np.testing.assert_allclose(w1.numpy(), w2.numpy(), atol=0)


def test_content_attention_parity(ref_attention):
    """ContentAttention has its own signature (query, memory, mask) and
    computes processed memory internally (reference attention.py:175-192)."""
    from tacotron2_subword_tpu.models import attention as A
    torch.manual_seed(2)
    ref = ref_attention.ContentAttention(
        query_dim=DIMS["attention_rnn_dim"],
        memory_dim=DIMS["embedding_dim"],
        attention_dim=DIMS["attention_dim"]).eval()
    params = {
        "memory": _lin(ref.memory_layer),
        "query": _lin(ref.query_layer),
        "v": _lin(ref.v),
    }
    memory, queries = _inputs(4)
    pm_j = A.process_memory(params, jnp.asarray(memory))
    state = A.init_state("ContentAttention", B, T)
    for q in queries[:3]:
        with torch.no_grad():
            ctx_t, w_t = ref(_t(q), _t(memory), None)
        ctx_j, w_j, state = A.attention_step(
            "ContentAttention", params, jnp.asarray(q), jnp.asarray(memory),
            pm_j, None, None, state)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(),
                                   atol=2e-4)


def test_dynamic_convolution_parity(ref_attention):
    """DCA: beta-binomial prior conv over the carried alignment + dynamic
    per-query filters (reference attention.py:195-289) — the state
    accumulator (alignment_pre ← weights) is exercised across steps."""
    torch.manual_seed(3)
    ref = ref_attention.DynamicConvolutionAttention(**DIMS).eval()
    params = {
        "memory": _lin(ref.memory_layer),
        "W": _lin(ref.W),
        "V": _lin(ref.V),
        "F": {"w": jnp.asarray(ref.F.weight.detach().numpy())},
        "U": _lin(ref.U),
        "T": _lin(ref.T),
        "v": _lin(ref.v),
        "prior": jnp.asarray(ref.P.detach().numpy()),
    }
    memory, queries = _inputs(5)
    _run_parity("DynamicConvolutionAttention", ref, params, memory, queries,
                atol=5e-5)


def test_gmm_parity(ref_attention):
    """GMM-v2: softplus/softmax mixture params, mu accumulates by delta
    every step (reference attention.py:401-472) — several steps so the mu
    drift is compared, not just the first call."""
    torch.manual_seed(4)
    ref = ref_attention.GMMAttention(**DIMS).eval()
    params = {
        "memory": _lin(ref.memory_layer),
        "mlp1": _lin(ref.mlp[0]),
        "mlp2": _lin(ref.mlp[2]),
    }
    memory, queries = _inputs(6)
    _run_parity("GMMAttention", ref, params, memory, queries, atol=2e-5)
