"""Config construction + the reference "[k:v-k:v]" hparams override parser
(reference hparams.py:108-114)."""

from tacotron2_subword_tpu.config import TacotronConfig, create_config


def test_defaults_match_reference_operating_point():
    c = TacotronConfig()
    assert (c.sampling_rate, c.filter_length, c.hop_length,
            c.win_length) == (22050, 1024, 256, 1024)
    assert (c.n_mel_channels, c.n_symbols, c.sub_n_symbols) == (80, 313,
                                                                5500)
    assert c.attention == "StepwiseMonotonicAttention"
    assert c.gate_threshold == 0.001 and c.max_decoder_steps == 1000


def test_hparams_string_parsing_types():
    c = create_config(hparams_string=(
        "[batch_size:4-learning_rate:0.01-attention:GMMAttention-"
        "prenet_dropout_always_on:False-mask_padding:true]"))
    assert c.batch_size == 4
    assert abs(c.learning_rate - 0.01) < 1e-9
    assert c.attention == "GMMAttention"
    assert c.prenet_dropout_always_on is False   # bool("False") would be True
    assert c.mask_padding is True


def test_hparams_unknown_keys_ignored():
    c = create_config(hparams_string="[nonsense:1-batch_size:2]")
    assert c.batch_size == 2


def test_overrides_win_over_string():
    c = create_config(overrides={"batch_size": 9},
                      hparams_string="[batch_size:2]")
    assert c.batch_size == 9
