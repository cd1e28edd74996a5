"""Config-system tests: interpolation, overrides, registry lookup."""

from pathlib import Path

import pytest

from multimodal_unlearning_tpu.config import get_model_identifiers, load_config
from multimodal_unlearning_tpu.config.loader import Config, apply_overrides, save_config

CONFIGS = Path(__file__).resolve().parents[1] / "configs"


def test_interpolation_basic():
    cfg = Config({"model_path": "models/x", "forget_loss": "npo", "save_dir": "${model_path}/${forget_loss}_run"})
    assert cfg.save_dir == "models/x/npo_run"


def test_interpolation_nested_and_typed():
    cfg = Config({"a": {"b": 3}, "c": "${a.b}", "d": "v=${a.b}"})
    assert cfg.c == 3  # whole-string interpolation preserves type
    assert cfg.d == "v=3"


def test_overrides_parse_scientific_notation():
    cfg = Config({"lr": 0.1, "LoRA": {"r": 0}})
    apply_overrides(cfg, ["lr=1e-5", "LoRA.r=8"])
    assert cfg.lr == pytest.approx(1e-5)
    assert isinstance(cfg.lr, float)
    assert cfg.LoRA.r == 8


def test_override_unknown_key_requires_plus():
    cfg = Config({"lr": 0.1})
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["new_key=1"])
    apply_overrides(cfg, ["+new_key=1"])
    assert cfg.new_key == 1


def test_registry_llava():
    m = get_model_identifiers("llava")
    assert m["vision_module"] == "vision_tower"
    assert m.arch.decoder.hidden_size == 4096
    assert m.arch.vision.image_size == 336
    # 576 patch tokens per image, like CLIP-ViT-L/14-336
    n_patches = (m.arch.vision.image_size // m.arch.vision.patch_size) ** 2
    assert n_patches == 576


def test_registry_arch_interpolation():
    m = get_model_identifiers("llama2-7b-eco")
    assert m.arch.hidden_size == 4096


def test_save_and_reload_roundtrip(tmp_path):
    cfg = load_config(CONFIGS / "mm", "forget")
    save_config(cfg, tmp_path / "config.yaml")
    cfg2 = load_config(tmp_path, "config")
    assert cfg2.forget_loss == cfg.forget_loss
    assert cfg2.batch_size == cfg.batch_size


def test_nested_writes_stick():
    """cfg["LoRA"]["r"] = 4 must mutate cfg itself, not a transient wrapper
    (nested nodes are wrapped once and stored back on first access)."""
    cfg = Config({"LoRA": {"r": 0, "alpha": 32}, "lr": 0.1})
    cfg["LoRA"]["r"] = 4
    assert cfg.LoRA.r == 4
    cfg.LoRA.alpha = 16
    assert cfg["LoRA"]["alpha"] == 16
    assert cfg.to_dict() == {"LoRA": {"r": 4, "alpha": 16}, "lr": 0.1}
    # dotted overrides still reach the same storage after wrapping
    apply_overrides(cfg, ["LoRA.r=8"])
    assert cfg.LoRA.r == 8
