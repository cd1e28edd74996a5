"""Plumbing for the differential parity harness vs the installed torch reference.

Drives the ACTUAL reference implementation (/root/reference, read-only) — not a
re-derivation of its formulas — against this framework on a shared tiny HF
LLaVA whose weights are bridged through models/hf_bridge.py:

- ``load_reference_trainer_cls()`` imports ``mm.trainer.MMTrainerForgetting``
  (mm/trainer.py:112-483) with its unavailable heavyweight deps (deepspeed,
  wandb) stubbed; neither is exercised by the single-process loss path.
- ``RefModelShim`` restores the pre-4.44 attribute surface the reference codes
  against: ``model.device`` assignment (mm/trainer.py:169),
  ``model.language_model.model.layers[7]`` for RMU (mm/trainer.py:308-309).
- ``make_ref_trainer()`` instantiates the trainer without HF ``Trainer.__init__``
  (which needs args/data): only the attributes ``compute_loss`` reads are set
  (the constructor body at mm/trainer.py:113-128 does exactly this).

Operating-point notes:
- The tiny decoder has 8 layers so the reference's hard-coded RMU layer index
  7 resolves.
- DPO parity runs on text-only batches: the reference's
  ``remove_image_tokens`` (mm/trainer_utils.py:48-70) assumes NON-expanded
  input_ids (one image token, pre-4.44 transformers) while the installed
  transformers requires expanded ids — on text rows the function is the
  identity and both conventions coincide.
- Labels carry -100 at image-token positions (this framework's invariant,
  models/llava.py; equivalent to the reference's effective supervision, whose
  text-space labels never cover patch positions).
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_PATH = "/root/reference"


def _natsorted(seq, key=None):
    """Functional stand-in for natsort.natsorted (not installed): split
    digit runs and compare numerically — sufficient for the reference's
    index-keyed dicts."""
    import re

    def k(x):
        s = str(key(x) if key else x)
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    return sorted(seq, key=k)


def stub_reference_deps():
    """Stub the reference's unavailable deps (deepspeed, wandb, hydra,
    natsort) just enough to import its modules; none of the stubbed
    functionality is on the single-process loss/eval/metrics paths."""
    import importlib.machinery

    def mk(name):
        mod = types.ModuleType(name)
        # transformers probes importlib.util.find_spec on these names
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    # "evaluate" (HF metrics hub) is only touched by nlp/evaluate_util.py's
    # eval_bleu at CALL time — an empty module satisfies the import
    for name in ("deepspeed", "wandb", "evaluate"):
        if name not in sys.modules:
            sys.modules[name] = mk(name)
    if "hydra" not in sys.modules:
        hydra = mk("hydra")
        hydra.main = lambda **kw: (lambda f: f)  # decorator surface only
        sys.modules["hydra"] = hydra
    if "natsort" not in sys.modules:
        natsort = mk("natsort")
        natsort.natsorted = _natsorted
        sys.modules["natsort"] = natsort
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    # mm/eval.py imports its siblings flat (from dataset import ..., from
    # utils import ...), the hydra-era run layout; nlp/dataloader.py likewise
    # (from data_module import get_batch_loss).  mm comes first, so its
    # finetune/forget win the (unimported-here) name collisions.
    # /methods makes the reference's `eco` package importable (its modules
    # import each other as `from eco.utils import ...`)
    for sub in ("/mm", "/nlp", "/methods"):
        p = REF_PATH + sub
        if p not in sys.path:
            sys.path.append(p)


def load_ref_module(modname: str):
    """Import a reference module (e.g. 'mm.trainer', 'mm.calculate_metrics',
    'utils') with the missing deps stubbed."""
    import importlib

    stub_reference_deps()
    return importlib.import_module(modname)


def load_reference_trainer_cls():
    return load_ref_module("mm.trainer").MMTrainerForgetting


# ---------------------------------------------------------------------------
# Shared tiny model pair
# ---------------------------------------------------------------------------

DEC_LAYERS = 8  # >= 8: the reference RMU pins language_model.model.layers[7]
VIT_LAYERS = 2
VOCAB = 256
HIDDEN = 64
IMAGE_TOKEN_ID = 250


def build_hf_llava(seed: int):
    import torch
    from transformers import LlavaConfig, LlavaForConditionalGeneration

    cfg = LlavaConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=VIT_LAYERS,
            num_attention_heads=2, image_size=32, patch_size=8,
            layer_norm_eps=1e-5, attn_implementation="eager",
        ),
        text_config=dict(
            vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
            num_hidden_layers=DEC_LAYERS, num_attention_heads=4,
            num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=10000.0,
            tie_word_embeddings=False, attn_implementation="eager",
        ),
        image_token_index=IMAGE_TOKEN_ID, vision_feature_layer=-2,
        vision_feature_select_strategy="default", projector_hidden_act="gelu",
    )
    torch.manual_seed(seed)
    return LlavaForConditionalGeneration(cfg).eval()


def hf_state_dict_flat(hf_model) -> dict:
    """Remap the current transformers nesting to the published flat LLaVA
    layout the bridge speaks (see tests/test_hf_parity.py)."""
    sd = {}
    for k, v in hf_model.state_dict().items():
        sd[_flat_name(k)] = v.detach().cpu().numpy()
    return sd


def _flat_name(k: str) -> str:
    if k.startswith("model.language_model."):
        return "language_model.model." + k[len("model.language_model."):]
    if k == "lm_head.weight":
        return "language_model.lm_head.weight"
    if k.startswith("model."):
        return k[len("model."):]
    return k


def bridge_params(hf_model, dtype=np.float32):
    import jax
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.models import hf_bridge

    sd = hf_state_dict_flat(hf_model)
    return jax.tree.map(jnp.asarray, hf_bridge.llava_from_hf(sd, DEC_LAYERS, VIT_LAYERS, dtype=dtype))


def bridge_grads(hf_model):
    """Map the torch parameter gradients through the SAME bridge as the
    weights (the name mapping is linear, so it applies to grads verbatim).
    Missing grads (params unused by a loss) become zeros."""
    import torch

    from multimodal_unlearning_tpu.models import hf_bridge

    sd = {}
    for k, p in hf_model.named_parameters():
        g = p.grad
        sd[_flat_name(k)] = (
            torch.zeros_like(p) if g is None else g
        ).detach().cpu().numpy()
    return hf_bridge.llava_from_hf(sd, DEC_LAYERS, VIT_LAYERS)


def ours_config():
    from multimodal_unlearning_tpu.models import llama, llava, vit

    return llava.LlavaConfig(
        decoder=llama.LlamaConfig(
            vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
            num_layers=DEC_LAYERS, num_heads=4, num_kv_heads=2,
        ),
        vision=vit.VitConfig(
            hidden_size=32, intermediate_size=64, num_layers=VIT_LAYERS,
            num_heads=2, patch_size=8, image_size=32,
        ),
        image_token_id=IMAGE_TOKEN_ID, vision_feature_layer=-2,
        vision_feature_select="patch",
    )


class RefModelShim:
    """Minimal wrapper giving an HF 4.5x LLaVA the attribute surface
    mm/trainer.py codes against (it must NOT be an nn.Module: HF's
    ``.device`` property is read-only and mm/trainer.py:169 assigns it)."""

    def __init__(self, hf_model):
        self.hf = hf_model
        # pre-4.44 path: model.language_model.model.layers[i]
        self.language_model = types.SimpleNamespace(
            model=types.SimpleNamespace(layers=hf_model.model.language_model.layers)
        )
        self.config = hf_model.config
        if not hasattr(self.config, "image_token_id"):
            self.config.image_token_id = self.config.image_token_index
        self.device = next(hf_model.parameters()).device

    def __call__(self, **kw):
        return self.hf(**kw)

    def generate(self, **kw):
        return self.hf.generate(**kw)

    def parameters(self):
        return self.hf.parameters()

    def named_parameters(self):
        return self.hf.named_parameters()


def make_ref_trainer(loss_type: str, teacher=None, *, beta=1.0, l1=0.0, l0=0.0,
                     l_norm_from="zero", loss_args=None, control_vec=None):
    cls = load_reference_trainer_cls()
    tr = object.__new__(cls)
    tr.loss_type = loss_type.lower()
    tr.teacher_model = teacher
    tr.loss_beta = beta
    tr.l1_lambda = l1
    tr.l0_lambda = l0
    tr.l_norm_from = l_norm_from
    tr.loss_args = loss_args or {}
    tr.is_deepspeed_enabled = False
    if control_vec is not None:
        tr.control_vec = control_vec
    return tr


# ---------------------------------------------------------------------------
# Shared synthetic batches
# ---------------------------------------------------------------------------


def make_split(rng, cfg, *, with_image: bool, B=2, text_len=12, q_len=4, nested_k=None):
    """One split dict in BOTH frameworks' tensor convention (expanded
    image-token ids, -100 labels on the question span and image positions)."""
    n_img = cfg.num_image_tokens if with_image else 0
    S = n_img + text_len
    shape = (B, nested_k, S) if nested_k else (B, S)
    ids = rng.integers(1, 200, shape)
    ids[..., :n_img] = IMAGE_TOKEN_ID
    labels = ids.copy()
    labels[..., : n_img + q_len] = -100
    mask = np.ones(shape, np.int64)
    out = {"input_ids": ids, "labels": labels, "attention_mask": mask}
    if with_image:
        img_shape = (B, nested_k, cfg.vision.image_size, cfg.vision.image_size, 3) if nested_k \
            else (B, cfg.vision.image_size, cfg.vision.image_size, 3)
        out["pixel_values"] = rng.normal(size=img_shape).astype(np.float32)
    return out


def to_torch_inputs(batch: dict) -> dict:
    import torch

    def conv(split):
        t = {}
        for k, v in split.items():
            if k == "pixel_values":
                # ours is NHWC (optionally nested [B,K,H,W,C]); torch NCHW
                v = np.moveaxis(v, -1, -3)
            t[k] = torch.tensor(v)
        return t

    return {name: conv(split) for name, split in batch.items()}


# ---------------------------------------------------------------------------
# Eval-engine parity plumbing (text-only: the reference's remove_image_tokens
# assumes non-expanded ids; on text rows it is the identity — mm/eval.py:165)
# ---------------------------------------------------------------------------


class ByteTokHF:
    """HF-call-surface adapter over ByteTokenizer, covering exactly what the
    reference eval loop touches (mm/eval.py:110-133): batch_decode,
    tokenizer.batch_encode_plus (left-padded, as LLaVA generation requires),
    pad_token_id."""

    def __init__(self, bt):
        self.bt = bt
        self.pad_token_id = bt.pad_token_id
        self.eos_token_id = bt.eos_token_id
        # string-token surface for nlp run_generation's
        # ``pad_token = eos_token`` aliasing (nlp/evaluate_util.py:166-167)
        self.eos_token = "</s>"
        self.pad_token = "<pad>"
        self.padding_side = "right"
        self.tokenizer = self  # processor.tokenizer aliases itself

    def batch_decode(self, tensors, skip_special_tokens=True):
        return [self.bt.decode(list(map(int, row)), skip_special_tokens=skip_special_tokens) for row in tensors]

    def batch_encode_plus(self, texts, add_special_tokens=True, return_tensors="pt", padding=True):
        import torch
        from transformers import BatchEncoding

        enc = [self.bt.encode(t, add_special_tokens=add_special_tokens) for t in texts]
        S = max(len(e) for e in enc)
        ids = np.full((len(enc), S), self.pad_token_id, np.int64)
        mask = np.zeros((len(enc), S), np.int64)
        for r, e in enumerate(enc):
            ids[r, S - len(e):] = e  # left padding
            mask[r, S - len(e):] = 1
        return BatchEncoding({"input_ids": torch.tensor(ids), "attention_mask": torch.tensor(mask)})


def make_eval_rows(rng, n, start_idx=0):
    """Synthetic QA rows with paraphrase + 3 perturbed answers."""
    rows = []
    for i in range(n):
        obj = rng.integers(0, 50)
        rows.append({
            "idx": start_idx + i,
            "question": f"What is the color of object {obj}? ",
            "answer": f"the color of object {obj} is blue and shiny",
            "paraphrased_answer": f"object {obj} is colored blue",
            "perturbed_answers": [
                f"the color of object {obj} is red",
                f"object {obj} looks green to me",
                f"it is a yellow object number {obj}",
            ],
        })
    return rows


def collate_text_rows(bt, rows, answer_key, max_len=128):
    """Left-padded teacher-forced batch matching both engines' conventions:
    labels = -100 on pads and the question span.

    max_len must cover question+answer untruncated: when truncation hides the
    answer, the reference's unguarded ``s[: s.rfind(ans)]`` (mm/eval.py:121)
    silently chops the final character (rfind == -1 → s[:-1]) while this
    framework's evaluator keeps the string intact (evaluator.py:125, a
    documented fix) — the engines only coincide on the untruncated path."""
    encs, q_lens, answers = [], [], []
    for r in rows:
        ans = r[answer_key]
        if isinstance(ans, list):  # nested perturbed: handled by caller
            raise ValueError("use collate_perturbed for list answers")
        q_ids = bt.encode(r["question"], add_special_tokens=True)
        full = q_ids + bt.encode(ans)
        full = full[:max_len]
        encs.append(full)
        q_lens.append(min(len(q_ids), len(full)))
        answers.append(bt.encode(ans))
    S = max(len(e) for e in encs)
    B = len(encs)
    ids = np.full((B, S), bt.pad_token_id, np.int64)
    mask = np.zeros((B, S), np.int64)
    labels = np.full((B, S), -100, np.int64)
    for r, (e, ql) in enumerate(zip(encs, q_lens)):
        off = S - len(e)
        ids[r, off:] = e
        mask[r, off:] = 1
        labels[r, off + ql:] = e[ql:]
    SA = max(len(a) for a in answers)
    ans_ids = np.full((B, SA), bt.pad_token_id, np.int64)
    for r, a in enumerate(answers):
        ans_ids[r, :len(a)] = a
    return {
        "input_ids": ids, "attention_mask": mask, "labels": labels,
        "indices": np.asarray([r["idx"] for r in rows]),
        "answers": ans_ids,
    }


def collate_perturbed_rows(bt, rows, max_len=128):
    """[B, K, S] nested batch over perturbed_answers."""
    per = []
    for r in rows:
        per.append([
            collate_text_rows(bt, [dict(r, answer=a)], "answer", max_len)
            for a in r["perturbed_answers"]
        ])
    K = len(per[0])
    S = max(c["input_ids"].shape[1] for row in per for c in row)

    def pad_to(a, S, fill):
        out = np.full((1, S), fill, a.dtype)
        out[:, S - a.shape[1]:] = a  # left-aligned pads stay left
        return out

    def stack(key, fill):
        return np.stack([
            np.concatenate([pad_to(c[key], S, fill) for c in row]) for row in per
        ])

    return {
        "input_ids": stack("input_ids", bt.pad_token_id),
        "attention_mask": stack("attention_mask", 0),
        "labels": stack("labels", -100),
        "indices": np.asarray([r["idx"] for r in rows]),
    }


def to_torch_batches(batches, *, keep=("input_ids", "attention_mask", "labels", "indices")):
    import torch

    out = []
    for b in batches:
        out.append({k: torch.tensor(v) for k, v in b.items() if k in keep})
    return out


def make_student_teacher_fns(cfg, params, teacher_params):
    """Closures matching train/losses.py's student/teacher protocol."""
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.models import llava

    def fwd(p, split, capture_layer=None):
        pix = split.get("pixel_values")
        out = llava.forward(
            p, cfg, jnp.asarray(split["input_ids"]),
            attention_mask=jnp.asarray(split["attention_mask"]),
            pixel_values=None if pix is None else jnp.asarray(pix),
            capture_layer=capture_layer,
            compute_dtype=jnp.float32,
        )
        return {"logits": out["logits"], "captured": out.get("captured")}

    def student_of(p):
        return lambda split, **kw: fwd(p, split, **kw)

    teacher = (lambda split, **kw: fwd(teacher_params, split, **kw)) if teacher_params is not None else None
    return student_of, teacher
