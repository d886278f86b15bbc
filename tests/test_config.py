import textwrap

from tair_tpu.config import ExperimentConfig, build_dataset, load_config


def test_load_config_defaults_and_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(textwrap.dedent("""
        model_preset: tiny
        dtype: float32
        dataset:
          kind: synthetic
          out_size: 64
        degradation:
          second_blur_prob: 0.5
          jpeg_range: [40, 90]
        train:
          stage: stage3
          batch_size: 7
        val:
          steps: 5
    """))
    cfg = load_config(str(p))
    assert cfg.model_preset == "tiny"
    assert cfg.dataset.out_size == 64
    assert cfg.degradation.second_blur_prob == 0.5
    assert cfg.degradation.jpeg_range == (40, 90)
    # untouched defaults survive
    assert cfg.degradation.gray_noise_prob == 0.4
    assert cfg.train.batch_size == 7
    assert cfg.train.learning_rate == 1e-4
    assert cfg.val.steps == 5


def test_empty_config_is_all_defaults(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("")
    cfg = load_config(str(p))
    assert isinstance(cfg, ExperimentConfig)
    assert cfg.train.stage == "stage1"


def test_build_synthetic_dataset(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("dataset:\n  kind: synthetic\n  out_size: 32\n  synthetic_length: 4\n")
    ds = build_dataset(load_config(str(p)), "TRAIN")
    assert len(ds) == 4
    assert ds[0]["hq"].shape == (32, 32, 3)
