"""Full-model numerical parity against the actual PyTorch reference.

Imports the reference implementation from /root/reference (read-only),
instantiates BERT_Tacotron2 on CPU with reduced dims, transfers its
state_dict into our JAX parameter tree via utils.import_torch, and compares
teacher-forced and free-running outputs element-wise.

CPU-compat shims applied to the reference (documented divergences it
requires to run at all on CPU):
 - ``librosa`` stubbed (only imported, not exercised, by utils/layers),
 - ``get_mask_from_lengths`` patched to drop the hardcoded
   ``torch.cuda.LongTensor`` (reference utils.py:12),
 - ``F.dropout`` patched to identity so the prenet's always-on dropout
   (reference model.py:23) is deterministic on both sides; our config uses
   ``prenet_dropout_always_on=False`` to match.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_librosa():
    if "librosa" in sys.modules:
        return
    librosa = types.ModuleType("librosa")
    util = types.ModuleType("librosa.util")
    filters = types.ModuleType("librosa.filters")
    util.normalize = lambda x, **kw: x
    util.pad_center = lambda x, size, **kw: x
    util.tiny = lambda x: np.finfo(np.float32).tiny
    filters.mel = lambda *a, **kw: np.zeros((80, 513), np.float32)
    librosa.util = util
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.util"] = util
    sys.modules["librosa.filters"] = filters


@pytest.fixture(scope="module")
def ref_modules():
    _stub_librosa()
    sys.path.insert(0, REF)
    try:
        import hparams as ref_hparams
        import model as ref_model
    finally:
        sys.path.remove(REF)

    # CPU shim for the hardcoded cuda tensor (reference utils.py:10-14)
    def cpu_mask(lengths):
        max_len = int(torch.max(lengths).item())
        ids = torch.arange(0, max_len, dtype=torch.long)
        return (ids[None, :] < lengths.unsqueeze(1)).bool()

    ref_model.get_mask_from_lengths = cpu_mask
    return ref_hparams, ref_model


def small_hp(ref_hparams):
    hp = ref_hparams.create_hparams()
    hp.n_symbols = 23
    hp.sub_n_symbols = 31
    hp.symbols_embedding_dim = 32
    hp.encoder_embedding_dim = 32
    hp.BERT_embedding_dim = 16
    hp.attention_rnn_dim = 24
    hp.attention_dim = 12
    hp.decoder_rnn_dim = 28
    hp.prenet_dim = 16
    hp.n_mel_channels = 8
    hp.postnet_embedding_dim = 16
    hp.max_decoder_steps = 15
    return hp


def jax_cfg():
    from tacotron2_subword_tpu.config import TacotronConfig
    return TacotronConfig(
        n_symbols=23, sub_n_symbols=31, symbols_embedding_dim=32,
        encoder_embedding_dim=32, bert_embedding_dim=16,
        attention_rnn_dim=24, attention_dim=12, decoder_rnn_dim=28,
        prenet_dim=16, n_mel_channels=8, postnet_embedding_dim=16,
        max_decoder_steps=15, prenet_dropout_always_on=False,
        parity_mode=True)


@pytest.fixture(scope="module")
def torch_model(ref_modules):
    ref_hparams, ref_model = ref_modules
    torch.manual_seed(0)
    m = ref_model.BERT_Tacotron2(small_hp(ref_hparams))
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    from tacotron2_subword_tpu.utils.import_torch import (
        params_from_torch_state_dict)
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_model.state_dict().items()}
    return params_from_torch_state_dict(sd, jax_cfg())


def _batch(seed=0, B=2, T_text=9, T_sub=6, T_out=12):
    rng = np.random.RandomState(seed)
    cfg = jax_cfg()
    return dict(
        text=rng.randint(1, cfg.n_symbols, (B, T_text)),
        text_lengths=np.asarray([T_text, T_text - 3]),
        sub=rng.randint(1, cfg.sub_n_symbols, (B, T_sub)),
        sub_lengths=np.asarray([T_sub, T_sub - 2]),
        mels=rng.randn(B, cfg.n_mel_channels, T_out).astype(np.float32),
        output_lengths=np.asarray([T_out, T_out - 4]),
        cls=rng.randn(B, cfg.bert_embedding_dim).astype(np.float32),
    )


def test_teacher_forced_mels_match_reference(torch_model, jax_params):
    from tacotron2_subword_tpu.models import tacotron2 as M
    b = _batch()
    B, T_text, T_sub = b["text"].shape[0], b["text"].shape[1], b["sub"].shape[1]

    cls_phone = np.repeat(b["cls"][:, None, :], T_text, axis=1)
    cls_sub = np.repeat(b["cls"][:, None, :], T_sub, axis=1)
    inputs = (
        torch.from_numpy(b["text"]).long(),
        torch.from_numpy(b["text_lengths"]).long(),
        torch.from_numpy(b["sub_lengths"]).long(),
        torch.from_numpy(b["mels"]),
        (int(b["text_lengths"].max()), int(b["output_lengths"].max())),
        torch.from_numpy(b["output_lengths"]).long(),
        torch.from_numpy(b["sub"]).long(),
        torch.from_numpy(cls_phone),
        torch.from_numpy(cls_sub),
    )
    ident = lambda x, p=0.5, training=False, inplace=False: x
    orig = torch.nn.functional.dropout
    torch.nn.functional.dropout = ident
    try:
        with torch.no_grad():
            ref_mel, ref_post, ref_gate, ref_al, ref_al_b = \
                torch_model(inputs)
    finally:
        torch.nn.functional.dropout = orig

    params, bn = jax_params
    batch = {
        "text": jnp.asarray(b["text"]),
        "text_lengths": jnp.asarray(b["text_lengths"]),
        "sub": jnp.asarray(b["sub"]), "sub_lengths": jnp.asarray(b["sub_lengths"]),
        "mels": jnp.asarray(b["mels"]),
        "output_lengths": jnp.asarray(b["output_lengths"]),
        "cls_phone": jnp.asarray(cls_phone), "cls_sub": jnp.asarray(cls_sub),
    }
    out, _ = M.forward(params, bn, jax_cfg(), batch, training=False,
                       rng=jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(out["mel"]), ref_mel.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mel_postnet"]),
                               ref_post.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["gate"]), ref_gate.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               ref_al.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments_bert"]),
                               ref_al_b.numpy(), atol=1e-4)


def test_inference_mels_match_reference(torch_model, jax_params):
    from tacotron2_subword_tpu.models import tacotron2 as M
    b = _batch(seed=3, B=1, T_text=7, T_sub=5, T_out=1)
    T_text, T_sub = b["text"].shape[1], b["sub"].shape[1]
    cls_phone = np.repeat(b["cls"][:, None, :], T_text, axis=1)
    cls_sub = np.repeat(b["cls"][:, None, :], T_sub, axis=1)

    torch_model.decoder.gate_threshold = 1.1  # force full-length decode
    ident = lambda x, p=0.5, training=False, inplace=False: x
    orig = torch.nn.functional.dropout
    torch.nn.functional.dropout = ident
    try:
        with torch.no_grad():
            ref_mel, ref_post, ref_gate, ref_al, ref_al_b, flag = \
                torch_model.inference(
                    torch.from_numpy(b["text"]).long(),
                    torch.from_numpy(b["sub"]).long(),
                    torch.from_numpy(cls_phone),
                    torch.from_numpy(cls_sub))
    finally:
        torch.nn.functional.dropout = orig
    assert flag is False  # hit max_decoder_steps

    cfg = jax_cfg()
    params, bn = jax_params
    out = M.infer(params, bn, cfg, jnp.asarray(b["text"]),
                  jnp.asarray(b["sub"]), jnp.asarray(cls_phone),
                  jnp.asarray(cls_sub), rng=jax.random.PRNGKey(0),
                  gate_threshold=1.1)
    assert not bool(np.asarray(out["infer_ok"]).any())
    assert out["mel"].shape == tuple(ref_mel.shape)
    np.testing.assert_allclose(np.asarray(out["mel"]), ref_mel.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mel_postnet"]),
                               ref_post.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               ref_al.numpy(), atol=1e-4)


@pytest.mark.skipif(not __import__("os").environ.get("FULL_PARITY"),
                    reason="full-size parity is opt-in: FULL_PARITY=1 "
                           "(CPU runtime ~2-4 min, ~1 GB RAM)")
def test_full_size_teacher_forced_parity(ref_modules):
    """Parity at the reference's PRODUCTION dims (512 embed / 1024 RNNs /
    80 mels / 313+5500 vocabs, reference hparams.py:62-95) — reduced-dim
    parity can hide dim-dependent bugs (init gains, layout, fan-in scaling).
    Teacher-forced, parity_mode (f32 highest precision), tolerance 2e-4."""
    import os
    from tacotron2_subword_tpu.config import TacotronConfig
    from tacotron2_subword_tpu.models import tacotron2 as M
    from tacotron2_subword_tpu.utils.import_torch import (
        params_from_torch_state_dict)

    ref_hparams, ref_model = ref_modules
    hp = ref_hparams.create_hparams()  # production defaults
    torch.manual_seed(0)
    tm = ref_model.BERT_Tacotron2(hp)
    tm.eval()

    cfg = TacotronConfig(prenet_dropout_always_on=False, parity_mode=True)
    assert cfg.symbols_embedding_dim == hp.symbols_embedding_dim == 512
    assert cfg.decoder_rnn_dim == hp.decoder_rnn_dim == 1024
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    params, bn = params_from_torch_state_dict(sd, cfg)

    rng = np.random.RandomState(42)
    B, T_text, T_sub, T_out = 2, 16, 8, 24
    b = dict(
        text=rng.randint(1, cfg.n_symbols, (B, T_text)),
        text_lengths=np.asarray([T_text, T_text - 5]),
        sub=rng.randint(1, cfg.sub_n_symbols, (B, T_sub)),
        sub_lengths=np.asarray([T_sub, T_sub - 3]),
        mels=rng.randn(B, cfg.n_mel_channels, T_out).astype(np.float32),
        output_lengths=np.asarray([T_out, T_out - 6]),
        cls=rng.randn(B, cfg.bert_embedding_dim).astype(np.float32),
    )
    cls_phone = np.repeat(b["cls"][:, None, :], T_text, axis=1)
    cls_sub = np.repeat(b["cls"][:, None, :], T_sub, axis=1)
    inputs = (
        torch.from_numpy(b["text"]).long(),
        torch.from_numpy(b["text_lengths"]).long(),
        torch.from_numpy(b["sub_lengths"]).long(),
        torch.from_numpy(b["mels"]),
        (T_text, T_out),
        torch.from_numpy(b["output_lengths"]).long(),
        torch.from_numpy(b["sub"]).long(),
        torch.from_numpy(cls_phone),
        torch.from_numpy(cls_sub),
    )
    ident = lambda x, p=0.5, training=False, inplace=False: x
    orig = torch.nn.functional.dropout
    torch.nn.functional.dropout = ident
    try:
        with torch.no_grad():
            ref_mel, ref_post, ref_gate, ref_al, ref_al_b = tm(inputs)
    finally:
        torch.nn.functional.dropout = orig

    batch = {
        "text": jnp.asarray(b["text"]),
        "text_lengths": jnp.asarray(b["text_lengths"]),
        "sub": jnp.asarray(b["sub"]),
        "sub_lengths": jnp.asarray(b["sub_lengths"]),
        "mels": jnp.asarray(b["mels"]),
        "output_lengths": jnp.asarray(b["output_lengths"]),
        "cls_phone": jnp.asarray(cls_phone), "cls_sub": jnp.asarray(cls_sub),
    }
    out, _ = M.forward(params, bn, cfg, batch, training=False,
                       rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["mel"]), ref_mel.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mel_postnet"]),
                               ref_post.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["gate"]), ref_gate.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments"]),
                               ref_al.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["alignments_bert"]),
                               ref_al_b.numpy(), atol=1e-4)


def test_prenet_dropout_distributional_parity(torch_model, jax_params):
    """The always-on prenet dropout path compared DISTRIBUTIONALLY against
    the reference (reference model.py:23 hardcodes training=True).  The
    deterministic parity tests patch F.dropout to identity, so they never
    exercise this path; here both models run teacher-forced in eval mode —
    where the prenet dropout is the ONLY active noise source on both sides
    — K times with fresh RNG, and the per-element MEAN mels must agree
    within Monte-Carlo error.  Fixed seeds: reproducible, not flaky."""
    from tacotron2_subword_tpu.models import tacotron2 as M

    K = 160
    b = _batch()
    T_text, T_sub = b["text"].shape[1], b["sub"].shape[1]
    cls_phone = np.repeat(b["cls"][:, None, :], T_text, axis=1)
    cls_sub = np.repeat(b["cls"][:, None, :], T_sub, axis=1)

    inputs = (
        torch.from_numpy(b["text"]).long(),
        torch.from_numpy(b["text_lengths"]).long(),
        torch.from_numpy(b["sub_lengths"]).long(),
        torch.from_numpy(b["mels"]),
        (int(b["text_lengths"].max()), b["mels"].shape[2]),
        torch.from_numpy(b["output_lengths"]).long(),
        torch.from_numpy(b["sub"]).long(),
        torch.from_numpy(cls_phone),
        torch.from_numpy(cls_sub),
    )
    torch.manual_seed(123)
    ref_samples = []
    with torch.no_grad():
        for _ in range(K):
            ref_samples.append(torch_model(inputs)[0].numpy())
    ref_samples = np.stack(ref_samples)

    cfg = jax_cfg().replace(prenet_dropout_always_on=True)
    params, bn = jax_params
    batch = {
        "text": jnp.asarray(b["text"]),
        "text_lengths": jnp.asarray(b["text_lengths"]),
        "sub": jnp.asarray(b["sub"]),
        "sub_lengths": jnp.asarray(b["sub_lengths"]),
        "mels": jnp.asarray(b["mels"]),
        "output_lengths": jnp.asarray(b["output_lengths"]),
        "cls_phone": jnp.asarray(cls_phone), "cls_sub": jnp.asarray(cls_sub),
    }
    fwd = jax.jit(lambda r: M.forward(params, bn, cfg, batch,
                                      training=False, rng=r)[0]["mel"])
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    jax_samples = np.stack([np.asarray(fwd(k)) for k in keys])

    # both sides estimate the same E[mel]; the MC standard error of the
    # difference of two K-sample means is sqrt(2/K)*std
    pooled_std = 0.5 * (ref_samples.std(0) + jax_samples.std(0))
    sem = pooled_std * np.sqrt(2.0 / K)
    diff = np.abs(ref_samples.mean(0) - jax_samples.mean(0))
    assert np.all(diff <= 6.0 * sem + 5e-3), (
        f"max normalized diff {np.max(diff / (sem + 1e-9)):.1f} sigma, "
        f"max abs diff {diff.max():.4f}")
    # and the noise MAGNITUDE itself must match: dropout scaling errors
    # (e.g. missing 1/keep_prob) show up as a std mismatch, not a mean shift
    s_ref, s_jax = ref_samples.std(0).mean(), jax_samples.std(0).mean()
    assert abs(s_ref - s_jax) / max(s_ref, 1e-6) < 0.15, (s_ref, s_jax)
