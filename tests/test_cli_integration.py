"""CLI integration tests: the full recipe as pytest (tiny models, synthetic
data).  These are the regression net for the end-to-end paths that were
hand-driven during development."""

import json

import numpy as np
import pytest

from multimodal_unlearning_tpu.config import load_config
from multimodal_unlearning_tpu.config.registry import config_dir

DATA = "synthetic:n_persons=40,qa_per_person=8"


def _cfg(sub, name, **overrides):
    cfg = load_config(config_dir() / sub, name)
    for k, v in overrides.items():
        # direct dict set (bypasses override parsing for test values)
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        dict.__setitem__(node, parts[-1], v)
    return cfg


@pytest.fixture(scope="module")
def ft_dir(tmp_path_factory):
    from multimodal_unlearning_tpu.cli import mm_finetune

    out = tmp_path_factory.mktemp("ft")
    cfg = _cfg(
        "mm", "finetune",
        model_family="tiny-llava-test", data_path=DATA, split="full+tofu",
        batch_size=2, gradient_accumulation_steps=1, num_epochs=0.05,
        max_length=128, lr=1e-3, save_dir=str(out), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 4)
    mm_finetune.run(cfg)
    assert (out / "model.safetensors").exists()
    return out


def test_mm_forget_from_checkpoint(ft_dir, tmp_path):
    from multimodal_unlearning_tpu.cli import mm_forget

    cfg = _cfg(
        "mm", "forget",
        model_family="tiny-llava-test", model_path=str(ft_dir),
        forget_data_path=DATA, retain_data_path=DATA,
        forget_split="forget10+tofu", retain_split="retain90+tofu",
        forget_loss="grad_ascent", batch_size=2, gradient_accumulation_steps=1,
        num_epochs=0.25, max_length=128, save_dir=str(tmp_path / "ga"),
        dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    history = mm_forget.run(cfg)
    assert (tmp_path / "ga" / "model.safetensors").exists()
    assert all(np.isfinite(h["loss"]) for h in history)


def test_mm_forget_kill_and_resume(tmp_path, monkeypatch):
    """Preemption safety: kill a forget run right after its epoch train-state
    checkpoint, resume with resume_from_checkpoint=True, and the resumed loss
    trajectory must equal the uninterrupted run's (deterministic batch-skip
    replay + restored optimizer moments)."""
    import pytest as _pytest

    from multimodal_unlearning_tpu.cli import mm_forget
    from multimodal_unlearning_tpu.train import checkpoints

    def cfg_for(out, **extra):
        cfg = _cfg(
            "mm", "forget",
            model_family="tiny-llava-test", model_path=None,
            forget_data_path=DATA, retain_data_path=DATA,
            forget_split="forget10+tofu", retain_split="retain90+tofu",
            forget_loss="grad_ascent", batch_size=2, gradient_accumulation_steps=1,
            num_epochs=2, max_length=128, save_dir=str(tmp_path / out),
            dtype="float32", **extra,
        )
        dict.__setitem__(cfg["LoRA"], "r", 0)
        return cfg

    full = mm_forget.run(cfg_for("full"))
    assert len(full) >= 2

    real_save = checkpoints.TrainStateCheckpointer.save

    def save_once_then_die(self, step, state):
        real_save(self, step, state)
        self.wait()  # the async write must land before the "preemption"
        raise KeyboardInterrupt("preempted right after the epoch checkpoint")

    monkeypatch.setattr(
        checkpoints.TrainStateCheckpointer, "save", save_once_then_die)
    with _pytest.raises(KeyboardInterrupt):
        mm_forget.run(cfg_for("pre"))
    monkeypatch.undo()

    ckpt_step = checkpoints.latest_train_state_step(tmp_path / "pre" / "train_state")
    assert ckpt_step is not None and ckpt_step > 0

    resumed = mm_forget.run(cfg_for("pre", resume_from_checkpoint=True))
    res = {h["step"]: h["loss"] for h in resumed}
    ful = {h["step"]: h["loss"] for h in full}
    assert min(res) > ckpt_step  # nothing before the resume point re-ran
    for s in res:
        np.testing.assert_allclose(res[s], ful[s], rtol=1e-6)


def test_mm_eval_single_task(ft_dir, tmp_path):
    from multimodal_unlearning_tpu.cli import mm_eval

    cfg = _cfg(
        "mm", "eval",
        model_family="tiny-llava-test", model_path=str(ft_dir),
        processor_path=None, save_dir=str(tmp_path / "eval"),
        ds_size=6, batch_size=4, max_length=256, dtype="float32",
        eval_task_ids=[2],  # eval_log_forget only; 6 rows / bs 4 -> a tail of
        # 2 > small_bs_pad(=1), so _pad_rows genuinely repeats rows to 4 and
        # outputs are sliced back
    )
    # default synthetic forget10 has only 4 rows; use a bigger corpus so
    # ds_size=6 really yields 6
    dict.__setitem__(cfg, "data_path", ["synthetic:n_persons=80,qa_per_person=8"] * 6)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
    agg = mm_eval.run(cfg)
    logs = agg["eval_log_forget.json"]
    assert set(logs) >= {
        "avg_gt_loss", "avg_paraphrased_loss", "average_perturb_loss",
        "truth_ratio", "rougeL_recall", "generated_text",
    }
    assert len(logs["avg_gt_loss"]) == 6  # tail rows present exactly once
    path = tmp_path / "eval" / "eval_log_aggregated.json"
    json.loads(path.read_text())


def test_mm_eval_engine_generate_identical_logs(ft_dir, tmp_path):
    """engine_generate=true: generations run as one continuous-batching
    drain over the serving engine (evaluator._pregenerate).  The aggregated
    eval logs must be IDENTICAL to the per-batch greedy path — same text,
    same ROUGE, same everything."""
    from multimodal_unlearning_tpu.cli import mm_eval

    def run(engine, out):
        cfg = _cfg(
            "mm", "eval",
            model_family="tiny-llava-test", model_path=str(ft_dir),
            processor_path=None, save_dir=str(tmp_path / out),
            ds_size=5, batch_size=2, max_length=256, dtype="float32",
            eval_task_ids=[2], engine_generate=engine,
        )
        dict.__setitem__(cfg, "data_path", ["synthetic:n_persons=80,qa_per_person=8"] * 6)
        dict.__setitem__(cfg["generation"], "max_new_tokens", 5)
        return mm_eval.run(cfg)

    plain = run(False, "eval_plain")
    engine = run(True, "eval_engine")
    assert json.dumps(plain, sort_keys=True, default=list) == json.dumps(
        engine, sort_keys=True, default=list)


def test_nlp_eval_engine_generate_identical_logs(tmp_path):
    """NLP analog of the engine_generate equality contract."""
    from multimodal_unlearning_tpu.cli import nlp_eval

    def run(engine, out):
        cfg = _cfg(
            "nlp", "eval_everything",
            model_family="tiny-llama-test", model_path=None,
            data_path=["synthetic:n_persons=8,qa_per_person=4"] * 4,
            save_dir=str(tmp_path / out), batch_size=2, dtype="float32",
            engine_generate=engine,
        )
        dict.__setitem__(cfg["generation"], "max_new_tokens", 5)
        dict.__setitem__(cfg["generation"], "max_length", 64)
        return nlp_eval.run(cfg)

    plain = run(False, "plain")
    eng = run(True, "eng")
    assert json.dumps(plain, sort_keys=True) == json.dumps(eng, sort_keys=True)


def test_mm_eval_generate_with_images(ft_dir, tmp_path):
    """generate_with_images=true: generation conditions on the REAL prompt
    (expanded image tokens + question, the -100-labeled span) instead of the
    reference's re-tokenized text-only question (mm/eval.py:120-124 quirk).
    The path must produce one generation per row and valid image prompts."""
    from multimodal_unlearning_tpu.cli import mm_eval

    cfg = _cfg(
        "mm", "eval",
        model_family="tiny-llava-test", model_path=str(ft_dir),
        processor_path=None, save_dir=str(tmp_path / "eval_gwi"),
        # batch_size=2 < the per-sample perturbed-answer count: the flattened
        # perturb batch (small_bs × num_seq) EXCEEDS batch_size, exercising
        # the tail padder's round-up (a downward target crashed here once)
        ds_size=6, batch_size=2, max_length=256, dtype="float32",
        eval_task_ids=[2], generate_with_images=True,
    )
    dict.__setitem__(cfg, "data_path", ["synthetic:n_persons=80,qa_per_person=8"] * 6)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
    logs = mm_eval.run(cfg)["eval_log_forget.json"]
    gen = logs["generated_text"]
    assert len(gen) == 6
    for _q, g, _a in gen.values():
        assert isinstance(g, str)
    assert all(np.isfinite(v) for v in logs["avg_gt_loss"].values())


def test_tail_padder_targets():
    """make_tail_padder: tails pad up to {small, batch_size}; batches LARGER
    than batch_size (flattened perturb batches, small_bs × num_perturbed)
    round UP to a multiple of small — never down (np.repeat negative-count
    regression, found driving mm_eval at batch_size=2)."""
    from multimodal_unlearning_tpu.cli.common import make_tail_padder

    pad, target = make_tail_padder(8)  # small = 2
    assert target(1) == 2 and target(2) == 2
    assert target(3) == 8 and target(8) == 8
    assert target(10) == 10  # 2 × 5 CLEAR perturbed answers: passthrough
    assert target(9) == 10
    a = np.arange(9 * 3).reshape(9, 3)
    p = pad(a, 10)
    assert p.shape == (10, 3) and (p[-1] == a[-1]).all() and (p[:9] == a).all()


def test_mm_eval_int8_decode(tmp_path):
    """quantize_base eval (int8 decoder weights ≈ 2x HBM-bound decode rate):
    the quantized run's teacher-forced losses track the dense run's."""
    from multimodal_unlearning_tpu.cli import mm_eval
    from multimodal_unlearning_tpu.models.llama import enable_int8_compute

    def run(out, **extra):
        cfg = _cfg(
            "mm", "eval",
            model_family="small-llava-test", model_path=None,
            processor_path=None, save_dir=str(tmp_path / out),
            ds_size=4, batch_size=4, max_length=192, dtype="float32",
            eval_task_ids=[2], **extra,
        )
        dict.__setitem__(cfg, "data_path", ["synthetic"] * 6)
        dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
        return mm_eval.run(cfg)["eval_log_forget.json"]

    dense = run("dense")
    try:
        quant = run("int8", quantize_base=True, int8_compute=True)
    finally:
        enable_int8_compute(False)
    d = np.array([dense["avg_gt_loss"][k] for k in sorted(dense["avg_gt_loss"])])
    q = np.array([quant["avg_gt_loss"][k] for k in sorted(quant["avg_gt_loss"])])
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q, d, rtol=0.15)  # int8 noise, same ranking


def test_nlp_grad_proj_runs(tmp_path):
    from multimodal_unlearning_tpu.cli import nlp_forget

    cfg = _cfg(
        "nlp", "forget",
        model_family="tiny-llama-test", model_path=None,
        data_path=DATA, split="forget10", forget_loss="grad_proj",
        batch_size=2, gradient_accumulation_steps=1, num_epochs=0.5,
        max_length=64, lr=1e-2, save_dir=str(tmp_path / "gp"), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    nlp_forget.run(cfg)
    assert (tmp_path / "gp" / "model.safetensors").exists()


@pytest.mark.parametrize(
    "family,img_px,n_patches",
    [("tiny-qwen2vl-test", 16, 16), ("tiny-qwen25vl-test", 32, 64)],
    ids=["qwen2vl", "qwen25vl"],
)
def test_qwen2vl_forget_and_generate(tmp_path, family, img_px, n_patches):
    """True-Qwen2-VL / Qwen2.5-VL end-to-end: forget CLI trains (loss finite,
    model saved), greedy generation runs with the M-RoPE rope-delta decode
    continuation (2.5: windowed RMS/SwiGLU tower)."""
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.cli import mm_forget
    from multimodal_unlearning_tpu.cli.common import (
        build_processor, init_or_load_params,
    )
    from multimodal_unlearning_tpu.config.registry import get_model_identifiers
    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate

    out = tmp_path / "qforget"
    cfg = _cfg(
        "mm", "forget",
        model_family=family, model_path="random-init",
        forget_data_path=DATA, retain_data_path=DATA,
        forget_loss="grad_diff_forget_ce_retain_ce",
        batch_size=2, gradient_accumulation_steps=1, num_epochs=0.1,
        max_length=96, lr=1e-3, save_dir=str(out), dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    history = mm_forget.run(cfg)
    assert history and np.isfinite(history[-1]["loss"])
    assert (out / "model.safetensors").exists()

    model_cfg = get_model_identifiers(family)
    kind, mcfg, params = init_or_load_params(model_cfg, str(out), dtype=jnp.float32)
    assert kind == "qwen2_vl"
    proc = build_processor(model_cfg, cfg)
    batch = proc.collate(
        [{"question": "who?", "answer": "me",
          "image": np.zeros((img_px, img_px, 3), np.float32), "idx": 0}],
        max_length=96,
    )
    assert batch["pixel_values"].shape[1:] == (n_patches, 96)  # patches, not raw pixels
    n_img_span = (batch["input_ids"] == 250).sum()
    assert n_img_span == mcfg.num_image_tokens
    gen = greedy_generate(
        params, mcfg,
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        max_new_tokens=4, pad_token_id=0, eos_token_id=None,
        pixel_values=jnp.asarray(batch["pixel_values"]), is_vlm=True,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, attn_impl="xla",
    )
    assert gen.shape == (1, 4)


def test_tp_in_finetune_eval_and_nlp(ft_dir, tmp_path):
    """tensor axis > 1 in mm_finetune, mm_eval, and nlp_forget (VERDICT r1:
    TP was wired in mm_forget only) — 8 virtual devices as data=2,fsdp=2? no:
    data=4,tensor=2."""
    from multimodal_unlearning_tpu.cli import mm_eval, mm_finetune, nlp_forget

    mesh = {"data": 4, "fsdp": 1, "tensor": 2}

    out_ft = tmp_path / "tp_ft"
    cfg = _cfg(
        "mm", "finetune",
        model_family="tiny-llava-test", data_path=DATA, split="full+tofu",
        batch_size=1, gradient_accumulation_steps=1, num_epochs=0.05,
        max_length=128, lr=1e-3, save_dir=str(out_ft), dtype="float32",
        mesh=mesh,
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)  # full-params path gets TP shardings
    mm_finetune.run(cfg)
    assert (out_ft / "model.safetensors").exists()

    cfg = _cfg(
        "mm", "eval",
        model_family="tiny-llava-test", model_path=str(ft_dir),
        processor_path=None, save_dir=str(tmp_path / "tp_eval"),
        ds_size=4, batch_size=4, max_length=256, dtype="float32",
        eval_task_ids=[2], mesh=mesh,
    )
    dict.__setitem__(cfg, "data_path", ["synthetic"] * 6)
    dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
    agg = mm_eval.run(cfg)
    assert "eval_log_forget.json" in agg

    out_nlp = tmp_path / "tp_nlp"
    cfg = _cfg(
        "nlp", "forget",
        model_family="tiny-llama-test", model_path=None,
        data_path=DATA, split="forget10", forget_loss="npo",
        batch_size=1, gradient_accumulation_steps=1, num_epochs=1,
        max_length=64, lr=1e-3, save_dir=str(out_nlp), dtype="float32",
        mesh=mesh,
    )
    dict.__setitem__(cfg["LoRA"], "r", 0)
    nlp_forget.run(cfg)
    assert (out_nlp / "model.safetensors").exists()


def test_mm_forget_quantized_teacher_is_aliased_base(tmp_path):
    """LoRA + quantize_base + quantize_teacher: the teacher must be the
    SAME tree as the frozen quantized base (teacher ≡ initial model when the
    base is frozen) — the copy-then-quantize path doubled 7B weight residency
    and OOMed the one-chip e2e pipeline.  Trains NPO on the small (≥256-dim)
    family so the int8 gate engages, and checks the run completes."""
    from multimodal_unlearning_tpu.cli import mm_forget

    out = tmp_path / "npo_alias"
    cfg = _cfg(
        "mm", "forget",
        model_family="small-llava-test", model_path=None,
        forget_data_path=DATA, retain_data_path=DATA,
        forget_split="forget10+tofu", retain_split="retain90+tofu",
        forget_loss="npo", batch_size=2, gradient_accumulation_steps=1,
        num_epochs=0.02, max_length=64, lr=1e-3, save_dir=str(out),
        quantize_base=True, quantize_teacher=True, dtype="float32",
    )
    dict.__setitem__(cfg["LoRA"], "r", 4)
    mm_forget.run(cfg)
    assert (out / "model.safetensors").exists()


def test_mm_eval_int4_decode(tmp_path):
    """quantize_base=int4 eval (grouped W4A16, utils/quantize.py — half the
    int8 weight stream): teacher-forced losses track the dense run's."""
    from multimodal_unlearning_tpu.cli import mm_eval

    def run(out, **extra):
        cfg = _cfg(
            "mm", "eval",
            model_family="small-llava-test", model_path=None,
            processor_path=None, save_dir=str(tmp_path / out),
            ds_size=4, batch_size=4, max_length=192, dtype="float32",
            eval_task_ids=[2], **extra,
        )
        dict.__setitem__(cfg, "data_path", ["synthetic"] * 6)
        dict.__setitem__(cfg["generation"], "max_new_tokens", 4)
        return mm_eval.run(cfg)["eval_log_forget.json"]

    dense = run("dense")
    quant = run("int4", quantize_base="int4")
    d = np.array([dense["avg_gt_loss"][k] for k in sorted(dense["avg_gt_loss"])])
    q = np.array([quant["avg_gt_loss"][k] for k in sorted(quant["avg_gt_loss"])])
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(q, d, rtol=0.3)  # int4 noise, same ballpark


def test_mm_eval_engine_generate_paged_identical(ft_dir, tmp_path):
    """engine_generate with page_size>0: the paged serving engine produces
    IDENTICAL aggregated eval logs to the dense engine path."""
    from multimodal_unlearning_tpu.cli import mm_eval

    def run(page, out):
        cfg = _cfg(
            "mm", "eval",
            model_family="tiny-llava-test", model_path=str(ft_dir),
            processor_path=None, save_dir=str(tmp_path / out),
            ds_size=5, batch_size=2, max_length=256, dtype="float32",
            eval_task_ids=[2], engine_generate=True, page_size=page,
        )
        dict.__setitem__(cfg, "data_path", ["synthetic:n_persons=80,qa_per_person=8"] * 6)
        dict.__setitem__(cfg["generation"], "max_new_tokens", 5)
        return mm_eval.run(cfg)

    dense = run(0, "eval_dense")
    paged = run(128, "eval_paged")
    assert json.dumps(dense, sort_keys=True, default=list) == json.dumps(
        paged, sort_keys=True, default=list)
