"""Vocoder tests: parity against the actual reference HiFi-GAN / WaveGlow
torch modules (imported from /root/reference), invertibility, denoiser."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


class AttrDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.__dict__ = self


SMALL_H = dict(
    resblock="1",
    upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
    upsample_initial_channel=32,
    resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 2, 3], [1, 2, 3]],
    num_mels=80, sampling_rate=22050,
)


@pytest.fixture(scope="module")
def ref_hifigan():
    sys.path.insert(0, REF)
    try:
        from hifigan_infer.hifigan_model import Generator
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    h = AttrDict(SMALL_H)
    g = Generator(h).eval()
    return g, h


def _jax_h():
    from tacotron2_subword_tpu.models.hifigan import HifiganConfig
    return HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2, 3), (1, 2, 3)), num_mels=80)


def test_hifigan_generator_matches_reference(ref_hifigan):
    from tacotron2_subword_tpu.models import hifigan as HG
    g, h = ref_hifigan
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    params = HG.import_torch_generator(sd, _jax_h())

    rng = np.random.RandomState(1)
    mel = rng.randn(2, 80, 17).astype(np.float32)
    with torch.no_grad():
        ref = g(torch.from_numpy(mel)).numpy()
    out = np.asarray(HG.generator_apply(params, _jax_h(), jnp.asarray(mel)))
    assert out.shape == ref.shape == (2, 1, 17 * 16)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    # fused (remove_weight_norm) form must agree with the reference's
    g.remove_weight_norm()
    with torch.no_grad():
        ref_fused = g(torch.from_numpy(mel)).numpy()
    fused = HG.fuse_generator(params)
    out_fused = np.asarray(HG.generator_apply(fused, _jax_h(),
                                              jnp.asarray(mel)))
    np.testing.assert_allclose(out_fused, ref_fused, atol=2e-5, rtol=1e-4)


def test_hifigan_init_and_losses():
    from tacotron2_subword_tpu.models import hifigan as HG
    h = _jax_h()
    params = HG.init_generator(jax.random.PRNGKey(0), h)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 9))
    wav = HG.generator_apply(params, h, mel)
    assert wav.shape == (2, 1, 9 * 16)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh output

    disc = HG.init_discriminators(jax.random.PRNGKey(2))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 144)) * 0.1
    rs, gs, fr, fg = HG.discriminators_apply(disc, y, wav)
    assert len(rs) == len(gs) == 8  # 5 periods + 3 scales
    d_loss = HG.discriminator_loss(rs, gs)
    g_loss = HG.generator_adv_loss(gs)
    f_loss = HG.feature_loss(fr, fg)
    for l in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(l))


@pytest.fixture(scope="module")
def ref_waveglow():
    sys.path.insert(0, REF)
    try:
        import glow as ref_glow
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    wg = ref_glow.WaveGlow(
        n_mel_channels=8, n_flows=4, n_group=4, n_early_every=2,
        n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3)).eval()
    return wg


def _wg_cfg():
    from tacotron2_subword_tpu.models.waveglow import WaveGlowConfig
    return WaveGlowConfig(n_mel_channels=8, n_flows=4, n_group=4,
                          n_early_every=2, n_early_size=2, wn_layers=2,
                          wn_channels=16, wn_kernel_size=3,
                          upsample_kernel=1024, upsample_stride=256)


def test_waveglow_forward_matches_reference(ref_waveglow):
    from tacotron2_subword_tpu.models import waveglow as WG
    cfg = _wg_cfg()
    sd = {k: v.detach().numpy() for k, v in ref_waveglow.state_dict().items()}
    params = WG.import_torch_waveglow(sd, cfg)

    rng = np.random.RandomState(2)
    F = 8
    mel = rng.randn(2, 8, F).astype(np.float32)
    audio = rng.randn(2, F * 256).astype(np.float32)
    with torch.no_grad():
        z_ref, log_s_ref, log_det_ref = ref_waveglow(
            (torch.from_numpy(mel), torch.from_numpy(audio)))
    z, log_s, log_det = WG.forward(params, cfg, jnp.asarray(mel),
                                   jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=1e-4,
                               rtol=1e-4)
    for a, b in zip(log_s, log_s_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4,
                                   rtol=1e-4)
    for a, b in zip(log_det, log_det_ref):
        # det ~= 1 at init so logdet ~= 0: absolute tolerance, not relative
        np.testing.assert_allclose(float(a), float(b), atol=5e-2)

    # loss parity
    sys.path.insert(0, REF)
    try:
        import glow as ref_glow
    finally:
        sys.path.remove(REF)
    ref_loss = ref_glow.WaveGlowLoss(sigma=1.0)(
        (z_ref, log_s_ref, log_det_ref)).item()
    our_loss = float(WG.loss((z, log_s, log_det), sigma=1.0))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-3, atol=1e-4)


def test_waveglow_old_format_import(ref_waveglow):
    """OLD-format checkpoints (reference waveglow/glow_old.py:30-64) split
    res_skip into per-layer res_layers/skip_layers and fuse cond per layer
    (cond_layers.{i}); the reference ships convert_model.py:11-38 to
    restructure them.  import_torch_waveglow accepts the old layout
    directly — build an old-format state_dict by inverse-splitting the
    modern one and require the imported pytree to match exactly."""
    from tacotron2_subword_tpu.models import waveglow as WG
    cfg = _wg_cfg()
    sd_new = {k: v.detach().numpy()
              for k, v in ref_waveglow.state_dict().items()}

    C, L = cfg.wn_channels, cfg.wn_layers
    sd_old = {}
    for key, val in sd_new.items():
        parts = key.split(".")
        if len(parts) >= 3 and parts[0] == "WN":
            if parts[2] == "cond_layer":
                # fused [2CL, ...] rows → per-layer cond_layers.{i}
                for i in range(L):
                    sd_old[f"WN.{parts[1]}.cond_layers.{i}.{parts[3]}"] = \
                        val[i * 2 * C:(i + 1) * 2 * C]
                continue
            if parts[2] == "res_skip_layers":
                i = int(parts[3])
                leaf = parts[4]
                if i < L - 1:
                    sd_old[f"WN.{parts[1]}.res_layers.{i}.{leaf}"] = val[:C]
                    sd_old[f"WN.{parts[1]}.skip_layers.{i}.{leaf}"] = val[C:]
                else:
                    sd_old[f"WN.{parts[1]}.skip_layers.{i}.{leaf}"] = val
                continue
        sd_old[key] = val

    p_new = WG.import_torch_waveglow(sd_new, cfg)
    p_old = WG.import_torch_waveglow(sd_old, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=0),
        p_new, p_old)

    # and the old-format import must drive the same synthesis
    rng = np.random.RandomState(5)
    mel = jnp.asarray(rng.randn(1, 8, 8).astype(np.float32))
    y_new = WG.infer(p_new, cfg, mel, sigma=0.6, key=jax.random.PRNGKey(3))
    y_old = WG.infer(p_old, cfg, mel, sigma=0.6, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=0)


def test_waveglow_vendored_glow_parity():
    """Forward parity against the VENDORED waveglow/glow.py (the per-layer
    cond_layers variant the reference trains with, waveglow/glow.py:
    119-176) — not just the synthetic re-split of the modern layout."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_glow_vendored", f"{REF}/waveglow/glow.py")
    ref_glow = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_glow)

    from tacotron2_subword_tpu.models import waveglow as WG
    cfg = _wg_cfg()
    torch.manual_seed(1)
    wg = ref_glow.WaveGlow(
        n_mel_channels=8, n_flows=4, n_group=4, n_early_every=2,
        n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3)).eval()
    sd = {k: v.detach().numpy() for k, v in wg.state_dict().items()}
    assert any(".cond_layers." in k for k in sd), "vendored layout expected"
    params = WG.import_torch_waveglow(sd, cfg)

    rng = np.random.RandomState(6)
    F = 8
    mel = rng.randn(2, 8, F).astype(np.float32)
    audio = rng.randn(2, F * 256).astype(np.float32)
    with torch.no_grad():
        z_ref, log_s_ref, _ = wg(
            (torch.from_numpy(mel), torch.from_numpy(audio)))
    z, log_s, _ = WG.forward(params, cfg, jnp.asarray(mel),
                             jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=1e-4,
                               rtol=1e-4)
    for a, b in zip(log_s, log_s_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4,
                                   rtol=1e-4)


def test_waveglow_infer_inverts_forward():
    """infer(sigma→) must be the inverse of forward: push audio through
    forward, reconstruct from z by the reverse flow."""
    from tacotron2_subword_tpu.models import waveglow as WG
    cfg = _wg_cfg()
    params = WG.init_waveglow(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    F = 8
    mel = jnp.asarray(rng.randn(1, 8, F).astype(np.float32))
    # infer with sigma=0: audio fully determined by the (zero) latents
    audio = WG.infer(params, cfg, mel, sigma=0.0, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(audio)).all()
    # round trip: forward(infer output) must give z == 0
    T = audio.shape[1]
    n_frames_needed = T // 256
    z, log_s, log_det = WG.forward(params, cfg, mel, audio)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-3)


def test_denoiser_removes_bias():
    from tacotron2_subword_tpu.models import denoiser as D
    rng = np.random.RandomState(4)
    bias_wave = np.sin(2 * np.pi * 100 * np.arange(8192) / 22050)
    bias_wave = bias_wave.astype(np.float32) * 0.1

    vocoder_fn = lambda mel: jnp.asarray(bias_wave[None, :])
    bias_spec = D.compute_bias_spec(vocoder_fn, n_mel_channels=8)
    assert bias_spec.shape == (1, 513, 1)

    noisy = jnp.asarray((bias_wave + 0.0 * rng.randn(8192))[None, :])
    den = D.denoise(noisy, bias_spec, strength=1.0)
    # removing the bias at full strength must cut most of the energy
    assert float(jnp.mean(den ** 2)) < 0.25 * float(jnp.mean(noisy ** 2))


def test_vocoders_bf16_cast_parity():
    """cast_floating(params, bf16) + bf16 mel must track the f32 output
    (conv accumulation stays f32 via preferred_element_type) — the
    production serving dtype used by bench.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.models import waveglow as WG
    from tacotron2_subword_tpu.nn.layers import cast_floating

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 8, 12).astype(np.float32))

    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2, 3),), num_mels=8)
    gen = HG.fuse_generator(HG.init_generator(jax.random.PRNGKey(0), h))
    ref = np.asarray(HG.generator_apply(gen, h, mel), np.float32)
    out = np.asarray(HG.generator_apply(
        cast_floating(gen, jnp.bfloat16), h,
        mel.astype(jnp.bfloat16)), np.float32)
    assert out.dtype == np.float32 and np.isfinite(out).all()
    # tanh-bounded output: absolute tolerance is the honest metric for bf16
    assert np.abs(out - ref).max() < 0.1
    assert np.abs(out - ref).mean() < 0.02

    wcfg = WG.WaveGlowConfig(n_flows=2, n_group=4, n_early_every=4,
                             n_early_size=2, n_mel_channels=8,
                             wn_layers=2, wn_channels=16,
                             wn_kernel_size=3)
    wg = WG.init_waveglow(jax.random.PRNGKey(1), wcfg)
    k = jax.random.PRNGKey(2)
    ref = np.asarray(WG.infer(wg, wcfg, mel, sigma=0.6, key=k), np.float32)
    out = np.asarray(WG.infer(cast_floating(wg, jnp.bfloat16), wcfg,
                              mel.astype(jnp.bfloat16), sigma=0.6, key=k),
                     np.float32)
    assert np.isfinite(out).all()
    # a flow INVERSE chains divisions by exp(s): bf16 noise amplifies
    # per-element (chaotic on random init), so the honest bf16 contract is
    # distribution-level agreement, not elementwise parity
    rms_ref = float(np.sqrt((ref ** 2).mean()))
    rms_out = float(np.sqrt((out ** 2).mean()))
    assert 0.5 < rms_out / rms_ref < 2.0


def test_tflite_export_roundtrip(tmp_path):
    """Export the JAX generator to TFLite (jax2tf) and drive it through
    models.vocoder_runtimes.load_tflite_vocoder — the reference's TFLite
    HiFi-GAN path (best_checkpoint.py:230-260), producer + consumer."""
    pytest.importorskip("tensorflow")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.models.vocoder_runtimes import \
        load_tflite_vocoder
    from tools.export_hifigan_tflite import export_tflite

    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2, 3),), num_mels=8)
    gen = HG.fuse_generator(HG.init_generator(jax.random.PRNGKey(0), h))
    path = str(tmp_path / "g.tflite")
    n = export_tflite(gen, h, path, frames=12, batch=1)
    assert n > 1000

    voc = load_tflite_vocoder(path)
    mel = np.random.RandomState(0).randn(1, 8, 12).astype(np.float32)
    out = voc(mel)
    ref = np.asarray(HG.generator_apply(gen, h, jnp.asarray(mel)))
    assert out.shape == (1, 12 * 16)  # 4*4 upsampling
    np.testing.assert_allclose(out, ref.reshape(1, -1), atol=1e-5)


def test_onnx_export_roundtrip(tmp_path):
    """Export the JAX generator to ONNX (ModelProto emitted natively by
    utils/onnx_lite — no onnx/tf2onnx in this image) and drive it through
    models.vocoder_runtimes.load_onnx_vocoder — the reference's ONNX
    HiFi-GAN backend (inference.py:208-223), producer + consumer.  Unlike
    TFLite, the time axis is dynamic: two different mel lengths run
    through the same file."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.models.vocoder_runtimes import \
        load_onnx_vocoder
    from tools.export_hifigan_onnx import export_onnx

    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2, 3), (1, 2)), num_mels=8)
    raw = HG.init_generator(jax.random.PRNGKey(0), h)
    gen = HG.fuse_generator(raw)
    path = str(tmp_path / "g.onnx")
    n = export_onnx(raw, h, path)  # weight-normed input: fused inside
    assert n > 1000

    voc = load_onnx_vocoder(path)
    for frames, seed in ((12, 0), (20, 1)):
        mel = np.random.RandomState(seed).randn(1, 8, frames) \
            .astype(np.float32)
        out = voc(mel)
        ref = np.asarray(HG.generator_apply(gen, h, jnp.asarray(mel)))
        assert out.shape == (1, frames * 16)  # 4*4 upsampling
        np.testing.assert_allclose(out, ref.reshape(1, -1), atol=2e-5)


def test_onnx_resblock2_roundtrip(tmp_path):
    """The v3-config ResBlock2 branch (reference hifigan_model.py:64-87)
    through the same export + numpy-executor path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron2_subword_tpu.models import hifigan as HG
    from tacotron2_subword_tpu.models.vocoder_runtimes import \
        load_onnx_vocoder
    from tools.export_hifigan_onnx import export_onnx

    h = HG.HifiganConfig(
        resblock="2", upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=8)
    raw = HG.init_generator(jax.random.PRNGKey(2), h)
    path = str(tmp_path / "g2.onnx")
    export_onnx(raw, h, path)
    voc = load_onnx_vocoder(path)
    mel = np.random.RandomState(3).randn(2, 8, 10).astype(np.float32)
    out = voc(mel)
    gen = HG.fuse_generator(raw)
    ref = np.asarray(HG.generator_apply(gen, h, jnp.asarray(mel)))
    assert out.shape == (2, 10 * 4)
    np.testing.assert_allclose(out, ref.reshape(2, -1), atol=2e-5)


def test_load_vocoder_onnx_backend(tmp_path):
    """apps.inference.load_vocoder dispatches .onnx checkpoints to the
    ONNX runtime path (the reference's onnxruntime backend,
    inference.py:208-223) and serves it through vocode_bucketed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron2_subword_tpu.apps.inference import (load_vocoder,
                                                      vocode_bucketed)
    from tacotron2_subword_tpu.models import hifigan as HG
    from tools.export_hifigan_onnx import export_onnx

    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=80)
    raw = HG.init_generator(jax.random.PRNGKey(4), h)
    path = str(tmp_path / "v.onnx")
    export_onnx(raw, h, path)
    voc, name = load_vocoder(path, None)
    assert name == "hifigan-onnx"
    wav = vocode_bucketed(voc, jnp.full((1, 80, 9), -5.0), 9, hop=16,
                          bucket=16)
    assert wav.shape == (1, 9 * 16) and np.isfinite(wav).all()


def test_load_vocoder_orbax_dir(tmp_path):
    """apps.inference.load_vocoder accepts an orbax generator dir from
    apps/train_hifigan (e.g. a GTA fine-tuned g_NNNNNNNN) and serves it
    fused, matching generator_apply on the raw weight-norm params."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from tacotron2_subword_tpu.apps.inference import load_vocoder
    from tacotron2_subword_tpu.models import hifigan as HG

    h = HG.HifiganConfig(
        resblock="1", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2, 3),), num_mels=8)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({
        "resblock": "1", "upsample_rates": [4, 4],
        "upsample_kernel_sizes": [8, 8], "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 2, 3]], "num_mels": 8}))
    gen = HG.init_generator(jax.random.PRNGKey(0), h)
    ckpt_dir = str(tmp_path / "g_00000042")
    ocp.PyTreeCheckpointer().save(
        ckpt_dir, jax.tree_util.tree_map(np.asarray, gen))

    vocode, name = load_vocoder(ckpt_dir, str(cfg_path))
    assert name == "hifigan"
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 8, 12), jnp.float32)
    out = np.asarray(vocode(mel))
    ref = np.asarray(HG.generator_apply(gen, h, mel))[:, 0, :]
    assert out.shape == (1, 12 * 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_hifigan_gan_state_resume_roundtrip(tmp_path):
    """apps.train_hifigan --resume must restore gen/disc/optimizer states
    against templates: exact roundtrip, and a loud failure on a structure
    mismatch (not silently misplaced leaves)."""
    import optax
    import orbax.checkpoint as ocp
    from tacotron2_subword_tpu.apps.train_hifigan import restore_gan_state
    from tacotron2_subword_tpu.models import hifigan as HG

    h = _jax_h()
    kg, kd = jax.random.split(jax.random.PRNGKey(7))
    gen = HG.init_generator(kg, h)
    disc = HG.init_discriminators(kd)
    tx = optax.adam(2e-4, b1=0.8, b2=0.99)
    opt_g, opt_d = tx.init(gen), tx.init(disc)
    # make the two optimizer states distinguishable (mu/nu asymmetric) so
    # a slot swap could not pass the exact-equality check below
    opt_g = jax.tree_util.tree_map(
        lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
        opt_g)
    st = {"gen": gen, "disc": disc, "opt_g": opt_g, "opt_d": opt_d,
          "it": 1234}
    path = str(tmp_path / "state_00001234")
    ocp.PyTreeCheckpointer().save(
        path, jax.tree_util.tree_map(np.asarray, st))

    g2 = HG.init_generator(jax.random.PRNGKey(8), h)
    d2 = HG.init_discriminators(jax.random.PRNGKey(9))
    og2, od2 = tx.init(g2), tx.init(d2)
    rg, rd, rog, rod, it = restore_gan_state(path, g2, d2, og2, od2)
    assert it == 1234
    for a, b in ((rg, gen), (rd, disc), (rog, opt_g), (rod, opt_d)):
        ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        assert len(ja) == len(jb)
        for x, y in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # structure mismatch (different optimizer -> different state pytree)
    # must raise, not silently fill wrong slots
    tx_sgd = optax.sgd(1e-3, momentum=0.9)
    with pytest.raises(Exception):
        restore_gan_state(path, g2, d2, tx_sgd.init(g2), tx_sgd.init(d2))


def test_hifigan_lr_decay_schedule(tmp_path):
    """make_optimizer mirrors the reference's per-epoch ExponentialLR
    (reference hifigan train.py / config_v1.json lr_decay=0.999): staircase
    decay every ``decay_every`` steps; lr_decay=1.0 keeps the historical
    (schedule-free) optimizer-state layout so pre-schedule checkpoints
    still restore; schedule state survives a save->resume roundtrip."""
    import optax
    import orbax.checkpoint as ocp
    from tacotron2_subword_tpu.apps.train_hifigan import (make_optimizer,
                                                          restore_gan_state)

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.ones((4,), jnp.float32)}

    # staircase decay: adam's bias-corrected update for a constant grad is
    # ~lr, so consecutive-window update ratios expose the schedule
    tx = make_optimizer(1e-2, lr_decay=0.5, decay_every=2)
    st = tx.init(params)
    mags = []
    for _ in range(6):
        upd, st = tx.update(grads, st, params)
        mags.append(float(jnp.abs(upd["w"]).mean()))
    assert abs(mags[1] / mags[0] - 1.0) < 0.05      # within an epoch: flat
    assert abs(mags[3] / mags[1] - 0.5) < 0.05      # epoch boundary: x0.5
    assert abs(mags[5] / mags[3] - 0.5) < 0.05

    # lr_decay=1.0 keeps the plain-adam state structure (old checkpoints)
    legacy = optax.adam(1e-2, b1=0.8, b2=0.99).init(params)
    flat = make_optimizer(1e-2, lr_decay=1.0).init(params)
    assert (jax.tree_util.tree_structure(flat)
            == jax.tree_util.tree_structure(legacy))

    # schedule count survives the templated save->resume roundtrip
    path = str(tmp_path / "state_00000006")
    ocp.PyTreeCheckpointer().save(
        path, jax.tree_util.tree_map(
            np.asarray, {"gen": params, "disc": params, "opt_g": st,
                         "opt_d": st, "it": 6}))
    tx2 = make_optimizer(1e-2, lr_decay=0.5, decay_every=2)
    _, _, rog, _, it = restore_gan_state(path, params, params,
                                         tx2.init(params), tx2.init(params))
    assert it == 6
    upd, _ = tx2.update(grads, rog, params)
    resumed = float(jnp.abs(upd["w"]).mean())
    upd7, _ = tx.update(grads, st, params)          # the un-resumed 7th
    expected = float(jnp.abs(upd7["w"]).mean())
    assert abs(resumed / expected - 1.0) < 0.05     # schedule continues
