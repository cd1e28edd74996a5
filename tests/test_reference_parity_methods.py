"""Differential parity for the methods subsystems vs the INSTALLED torch
reference: ECO corruption ops (methods/eco/corrupt.py), SalUn mask
generation (methods/salun/generate_mask.py), and the CV AdMSoftmax loss
(cv/AdMSLoss.py) — each driven as the actual reference code in-process on
shared inputs/weights.

Reference quirks pinned here:

- ``AdMSoftmaxLoss`` does NOT normalize its weight matrix: the
  ``for W in ...: W = F.normalize(W)`` loop rebinds the loop variable and
  discards the result (cv/AdMSLoss.py:26-27) — only the features are
  normalized.  Ours matches by default; ``normalize_w=True`` is the
  documented fix.
- SalUn accumulates SIGNED gradients across batches and takes |·| once at
  the end (generate_mask.py:41-49), ranks magnitudes in FLOAT16, keeps
  ``int(t · numel)`` entries per ``model.parameters()`` tensor (truncation —
  zero entries possible), exactly that many (no tie inflation).
- ``set_rand_noise_first_n`` zeroes the first dims of NON-attack positions
  (the reference writes its zeros-initialized noise buffer into
  ``data[:, :, :dims]`` for every position, corrupt.py:214).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.ref_parity_common import load_ref_module

# ---------------------------------------------------------------------------
# ECO corruption ops
# ---------------------------------------------------------------------------

DETERMINISTIC_OPS = [
    ("zero_out_top_k", False),
    ("zero_out_first_n", False),
    ("flip_sign_first_n", False),
    ("flip_sign_top_k", False),
    ("sub_value_top_k", True),
    ("add_value_least_k", True),
    ("sub_value_first_n", True),
    ("add_value_first_n", True),
    ("reverse_order", False),
]

B, S, D = 2, 6, 16
DIMS = 5
STRENGTH = 0.7


def _eco_inputs(seed=3):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(B, S, D)).astype(np.float32)
    pos = np.zeros((B, S), bool)
    pos[0, 1:4] = True
    pos[1, 0] = True  # row with a single attack position
    return data, pos


@pytest.mark.parametrize("op,takes_strength", DETERMINISTIC_OPS,
                         ids=[o[0] for o in DETERMINISTIC_OPS])
def test_eco_corrupt_op_matches_reference(op, takes_strength):
    import torch

    import jax.numpy as jnp

    from multimodal_unlearning_tpu.methods.eco import corrupt as ours

    ref = load_ref_module("methods.eco.corrupt")
    data, pos = _eco_inputs()

    t_args = (torch.tensor(data.copy()), pos, DIMS)
    j_args = (jnp.asarray(data), jnp.asarray(pos), DIMS)
    if takes_strength:
        t_args += (STRENGTH,)
        j_args += (STRENGTH,)
    ref_out = ref.corrupt_methods[op](*t_args).numpy()
    our_out = np.asarray(ours.corrupt_methods[op](*j_args))
    np.testing.assert_allclose(our_out, ref_out, rtol=0, atol=1e-6)
    # non-vacuous: the op changed something
    assert np.abs(ref_out - data).max() > 0


def test_eco_set_rand_noise_zeroes_nonattack_rows():
    """The deterministic half of set_rand_noise_first_n: the reference's
    buffer assignment zeroes the first dims at NON-attack positions
    (corrupt.py:200-215) — both implementations must agree there, and both
    must leave dims >= DIMS untouched everywhere."""
    import torch

    import jax
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.methods.eco import corrupt as ours

    ref = load_ref_module("methods.eco.corrupt")
    data, pos = _eco_inputs()

    ref_out = ref.corrupt_methods["set_rand_noise_first_n"](
        torch.tensor(data.copy()), pos, DIMS, STRENGTH).numpy()
    our_out = np.asarray(ours.set_rand_noise_first_n(
        jnp.asarray(data), jnp.asarray(pos), DIMS, STRENGTH,
        jax.random.PRNGKey(0)))

    nonattack = ~pos
    np.testing.assert_array_equal(ref_out[nonattack][:, :DIMS], 0.0)
    np.testing.assert_array_equal(our_out[nonattack][:, :DIMS], 0.0)
    np.testing.assert_allclose(ref_out[:, :, DIMS:], data[:, :, DIMS:], atol=1e-7)
    np.testing.assert_allclose(our_out[:, :, DIMS:], data[:, :, DIMS:], atol=1e-7)
    # attack positions carry (different-RNG) nonzero noise in both
    assert np.abs(ref_out[pos][:, :DIMS]).min() > 0
    assert np.abs(our_out[pos][:, :DIMS]).min() > 0


# ---------------------------------------------------------------------------
# ECO AttackedModel end-to-end: reference forward-hook corruption vs our
# embed-transform injection on a shared tiny llama
# ---------------------------------------------------------------------------


class _GateShim:
    """prompt classifier: flag every prompt (reference None-path semantics,
    attk_model.py:70-73, via an explicit classifier so both sides share it)."""

    def predict(self, prompts, threshold=0.5):
        return [1] * len(prompts)


class _TokenShim:
    """token classifier returning FIXED labels so both frameworks corrupt
    identical positions (the tokenizer-driven label path is covered by the
    classifier tests)."""

    def __init__(self, labels):
        self.labels = labels

    def predict_target_token_labels(self, prompts, tokenizer):
        return [list(l) for l in self.labels[: len(prompts)]]


class _TokShim:
    pad_token_id = 0
    eos_token_id = -1  # never emitted

    def decode(self, ids, skip_special_tokens=True):
        return "x"


def test_eco_attacked_model_matches_reference():
    """The reference corrupts via a forward hook on model.embed_tokens
    (eco/utils.py:7-16, prefill-only: outputs.shape[1] > 1); ours corrupts
    the embedding output and feeds inputs_embeds.  Same weights, same
    corruption pattern, deterministic op -> logits must match; greedy
    corrupted-prefill generation must be token-exact."""
    import types

    import torch

    import jax.numpy as jnp
    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_unlearning_tpu.methods.eco import attacked_model as ours_am
    from multimodal_unlearning_tpu.models import hf_bridge, llama

    attk = load_ref_module("eco.attk_model")

    NL, H, V = 2, 32, 64
    cfg_hf = LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=NL, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg_hf).eval()
    # neither side should stop at an eos with a tiny random vocab (ours pins
    # eos to an unreachable id; HF must not fall back to config eos=2)
    hf.generation_config.eos_token_id = None
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = hf_bridge.llama_from_hf(sd, NL)
    ocfg = llama.LlamaConfig(vocab_size=V, hidden_size=H,
                             intermediate_size=64, num_layers=NL,
                             num_heads=4, num_kv_heads=2)

    Bq, Sq = 2, 9
    rng = np.random.default_rng(2)
    ids = rng.integers(3, V - 4, (Bq, Sq))
    mask = np.ones((Bq, Sq), np.int64)
    labels = [[0, 1, 1, 1, 0, 1, 0, 0, 0], [1, 1, 0, 0, 1, 1, 1, 0, 0]]
    prompts = ["p0", "p1"]

    # plain logits FIRST — the reference's corruption hook stays registered
    # after an AttackedModel call (remove_hooks only runs on the next call),
    # so a control forward taken afterwards would be corrupted too
    with torch.no_grad():
        plain = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()

    model_ns = types.SimpleNamespace(
        model_name="tiny-llama", model=hf, tokenizer=_TokShim(),
        model_config={"attack_module": "model.embed_tokens"},
        device=torch.device("cpu"), generation_config=None,
    )
    ref_am = attk.AttackedModel(
        model_ns, _GateShim(), _TokenShim(labels),
        corrupt_method="zero_out_top_k", corrupt_args={"dims": 7},
        classifier_threshold=0.999,
    )
    with torch.no_grad():
        ref_out = ref_am(prompts, input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(mask))
    ref_logits = ref_out.logits.numpy()

    our_am = ours_am.AttackedModel(
        params, ocfg, _TokShim(), _GateShim(), _TokenShim(labels),
        corrupt_method="zero_out_top_k", corrupt_args={"dims": 7},
        threshold=0.999,
    )
    our_logits = np.asarray(our_am(ids, attention_mask=mask,
                                   prompts=prompts)["logits"])
    np.testing.assert_allclose(our_logits, ref_logits, atol=3e-5)

    # corruption was load-bearing: uncorrupted logits differ
    assert np.abs(plain - ref_logits).max() > 1e-3

    # corrupted-prefill GENERATION: hook skips S==1 decode steps
    # (eco/utils.py:11) == our corrupt-prefill-then-clean-decode; greedy
    # tokens must be identical
    with torch.no_grad():
        ref_am2 = attk.AttackedModel(
            model_ns, _GateShim(), _TokenShim(labels),
            corrupt_method="zero_out_top_k", corrupt_args={"dims": 7},
        )
        ref_gen = ref_am2.generate(
            prompts, input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        ).numpy()[:, Sq:]
    our_gen = our_am.generate(ids, mask, max_new_tokens=8, prompts=prompts)
    np.testing.assert_array_equal(our_gen, ref_gen)


# ---------------------------------------------------------------------------
# CV AdMSoftmax
# ---------------------------------------------------------------------------


def test_adms_loss_matches_reference():
    import torch

    import jax
    import jax.numpy as jnp

    from multimodal_unlearning_tpu.models import resnet

    ref_mod = load_ref_module("cv.AdMSLoss")
    IN, OUT, N = 12, 7, 10
    torch.manual_seed(0)
    crit = ref_mod.AdMSoftmaxLoss(IN, OUT, s=30.0, m=0.4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, IN)).astype(np.float32)
    labels = rng.integers(0, OUT, N)

    xt = torch.tensor(x, requires_grad=True)
    ref_loss = crit(xt, torch.tensor(labels))
    ref_loss.backward()
    ref_gx = xt.grad.numpy()
    ref_gw = crit.fc.weight.grad.numpy()  # [OUT, IN]

    head = {"weight": jnp.asarray(crit.fc.weight.detach().numpy().T)}  # [IN, OUT]

    def loss_fn(h, e):
        return resnet.adms_loss(h, e, jnp.asarray(labels), s=30.0, m=0.4)

    our_loss, (gh, ge) = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(
        head, jnp.asarray(x))
    assert abs(float(our_loss) - float(ref_loss)) / abs(float(ref_loss)) < 1e-5
    np.testing.assert_allclose(np.asarray(ge), ref_gx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh["weight"]).T, ref_gw, atol=1e-5)

    # non-vacuous: the reference's weight "normalization" is a no-op —
    # normalize_w=True (the textbook fix) computes a DIFFERENT loss on the
    # same unnormalized weights
    fixed = resnet.adms_loss(head, jnp.asarray(x), jnp.asarray(labels),
                             s=30.0, m=0.4, normalize_w=True)
    assert abs(float(fixed) - float(ref_loss)) / abs(float(ref_loss)) > 1e-3


# ---------------------------------------------------------------------------
# SalUn mask generation
# ---------------------------------------------------------------------------


def test_salun_masks_match_reference(tmp_path):
    """Drive the ACTUAL save_gradient_ratio (generate_mask.py:17-89) on a
    tiny HF llama over two forget batches, then compare every threshold's
    saved mask against ours on bridged weights.  Exact equality is asserted
    per tensor on counts AND on every element whose fp16 magnitude differs
    from the cutoff value (tie order inside a fp16-equal block is sort-
    implementation-defined in both frameworks)."""
    torch = pytest.importorskip("torch")
    import types

    import jax
    import jax.numpy as jnp
    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_unlearning_tpu.methods import salun
    from multimodal_unlearning_tpu.models import hf_bridge, llama

    NL = 2
    cfg_hf = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=NL, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg_hf)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = hf_bridge.llama_from_hf(sd, NL)
    ocfg = llama.LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=NL,
                             num_heads=4, num_kv_heads=2)

    rng = np.random.default_rng(5)
    batches = []
    for _ in range(2):
        ids = rng.integers(3, 60, (2, 8))
        labels = ids.copy()
        labels[:, :2] = -100
        mask = np.ones((2, 8), np.int64)
        batches.append({"input_ids": ids, "labels": labels,
                        "attention_mask": mask})

    # --- reference: the real save_gradient_ratio over a list "loader"
    gm = load_ref_module("methods.salun.generate_mask")
    loader = [
        (torch.tensor(b["input_ids"]), torch.tensor(b["labels"]),
         torch.tensor(b["attention_mask"]), torch.arange(2))
        for b in batches
    ]
    cfg = types.SimpleNamespace(unlearn_lr=0.1, weight_decay=0.0,
                                save_dir=str(tmp_path))
    gm.save_gradient_ratio(loader, hf, torch.nn.CrossEntropyLoss(), cfg)

    # --- ours
    def grad_fn(tr, batch):
        def f(p):
            out = llama.forward(p, ocfg, jnp.asarray(batch["input_ids"]),
                                attention_mask=jnp.asarray(batch["attention_mask"]),
                                compute_dtype=jnp.float32)
            from multimodal_unlearning_tpu.train.losses import ce_loss
            return ce_loss(out["logits"], jnp.asarray(batch["labels"]))

        return jax.grad(f)(tr)

    sal = salun.accumulate_saliency(grad_fn, params, batches)
    our_masks = salun.masks_for_thresholds(sal, thresholds=(0.1, 0.5, 0.9))

    for t in (0.1, 0.5, 0.9):
        ref_mask_sd = torch.load(tmp_path / f"with_{t}.pt", weights_only=True)
        ref_sal_like = {k: v.float().numpy() for k, v in ref_mask_sd.items()}
        bridged_mask = hf_bridge.llama_from_hf(ref_sal_like, NL)
        # the fp16 saliency values themselves (for the tie analysis)
        ref_sal16 = jax.tree.map(
            lambda x: np.asarray(x, np.float16), sal)
        for kp, rm in jax.tree_util.tree_leaves_with_path(bridged_mask):
            om = our_masks[t]
            s16 = ref_sal16
            for k in kp:
                om, s16 = om[k.key], s16[k.key]
            rm, om = np.asarray(rm), np.asarray(om)
            # per-tensor kept-count must match int(t*numel) exactly —
            # for stacked [L,...] leaves per LAYER (reference: per tensor)
            if rm.ndim >= 2 and kp[0].key == "layers":
                rows = rm.reshape(rm.shape[0], -1)
                orows = om.reshape(om.shape[0], -1)
                srows = np.asarray(s16).reshape(rm.shape[0], -1)
            else:
                rows = rm.reshape(1, -1)
                orows = om.reshape(1, -1)
                srows = np.asarray(s16).reshape(1, -1)
            for r in range(rows.shape[0]):
                n = rows.shape[1]
                k_expect = int(t * n)
                assert int(rows[r].sum()) == k_expect, \
                    f"{jax.tree_util.keystr(kp)}[{r}]: ref count {int(rows[r].sum())} != {k_expect}"
                assert int(orows[r].sum()) == k_expect, \
                    f"{jax.tree_util.keystr(kp)}[{r}]: our count {int(orows[r].sum())} != {k_expect}"
                # element-level equality away from fp16 ties at the cutoff
                if k_expect:
                    kept_vals = srows[r][rows[r] == 1]
                    cutoff = kept_vals.min()
                    clear = srows[r] != cutoff
                    np.testing.assert_array_equal(
                        orows[r][clear], rows[r][clear],
                        err_msg=f"{jax.tree_util.keystr(kp)}[{r}] t={t}")
