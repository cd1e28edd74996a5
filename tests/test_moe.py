"""Mixture-of-experts decoder (ops/moe.py + models/llama.py num_experts>0):
HF-Mixtral logit parity through the bridge, expert parallelism over the
'expert' mesh axis, the capacity dispatch path, and decode/train plumbing.

Beyond-reference model family (the reference zoo is dense-only); the HF
anchor is ``MixtralForCausalLM`` (random init, no hub access).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodal_unlearning_tpu.models import hf_bridge, llama
from multimodal_unlearning_tpu.ops.moe import (
    expert_capacity,
    load_balance_aux_loss,
    moe_mlp,
    router_weights,
)
from multimodal_unlearning_tpu.parallel import MeshSpec, make_mesh


OURS_CFG = llama.LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2,
    rope_theta=10000.0, max_position_embeddings=256, rms_norm_eps=1e-5,
    num_experts=4, num_experts_per_tok=2,
)


@pytest.fixture(scope="module")
def hf_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return cfg, MixtralForCausalLM(cfg).eval()


def bridged_params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return jax.tree.map(
        jnp.asarray, hf_bridge.llama_from_hf(sd, 2, num_experts=4)
    )


def test_mixtral_logits_match_hf(hf_mixtral):
    _, hf_model = hf_mixtral
    params = bridged_params(hf_model)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, (2, 12))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(
        llama.forward(params, OURS_CFG, jnp.asarray(ids), compute_dtype=jnp.float32)["logits"]
    )
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-4)


def test_mixtral_bridge_roundtrip(hf_mixtral):
    _, hf_model = hf_mixtral
    params = bridged_params(hf_model)
    sd2 = hf_bridge.llama_to_hf(jax.tree.map(np.asarray, params))
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_expert_parallel_matches_unsharded(hf_mixtral):
    """'expert' mesh axis: GSPMD partitions the dispatch/combine einsums;
    logits must match the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    _, hf_model = hf_mixtral
    params = bridged_params(hf_model)
    mesh = make_mesh(MeshSpec(data=2, fsdp=2, expert=2))
    assert mesh.shape["expert"] == 2

    # expert-stacked leaves sharded over 'expert' on dim 1
    layers = dict(params["layers"])
    for n in ("gate_proj", "up_proj", "down_proj"):
        layers[n] = jax.device_put(
            layers[n], NamedSharding(mesh, P(None, "expert", None, None))
        )
    ep = dict(params, layers=layers)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (4, 16))
    ref = llama.forward(params, OURS_CFG, jnp.asarray(ids), compute_dtype=jnp.float32)["logits"]
    shard = jax.jit(
        lambda p, i: llama.forward(p, OURS_CFG, i, compute_dtype=jnp.float32)["logits"]
    )(ep, jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P(("data", "fsdp")))))
    np.testing.assert_allclose(np.asarray(shard), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_capacity_route_matches_dense_with_headroom():
    """With capacity ≥ every expert's actual load the Switch dispatch is
    exact; with capacity 0.25 it drops tokens (delta = 0 for the overflow)."""
    rng = np.random.default_rng(2)
    B, S, H, I, E, k = 2, 16, 16, 32, 4, 2
    h = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(H, E)), jnp.float32)
    gate = jnp.asarray(rng.normal(size=(E, H, I)) * H**-0.5, jnp.float32)
    up = jnp.asarray(rng.normal(size=(E, H, I)) * H**-0.5, jnp.float32)
    down = jnp.asarray(rng.normal(size=(E, I, H)) * I**-0.5, jnp.float32)

    dense = moe_mlp(h, router, gate, up, down, k, route="dense")
    # S·k/E = 8 picks per expert on average; capacity_factor 4 → C=32 ≥ S·k
    cap = moe_mlp(h, router, gate, up, down, k, route="capacity", capacity_factor=4.0)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(dense), atol=1e-5, rtol=1e-5)

    tight = moe_mlp(h, router, gate, up, down, k, route="capacity", capacity_factor=0.25)
    assert float(jnp.max(jnp.abs(tight - dense))) > 1e-4  # something dropped


def test_vlm_moe_composition():
    """A VLM family composes with a MoE decoder by declaring num_experts in
    its nested decoder arch block — LLaVA-MoE forward + grad_diff train step."""
    import copy

    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.models import llava
    from multimodal_unlearning_tpu.train import optim, trainer

    mid = get_model_identifiers("tiny-llava-test")
    arch = copy.deepcopy({k: (dict(v) if hasattr(v, "keys") else v)
                          for k, v in dict(mid["arch"]).items()})
    arch["decoder"]["num_experts"] = 4
    arch["decoder"]["num_experts_per_tok"] = 2
    mcfg = build_model_config(dict(mid, arch=arch))
    assert mcfg.decoder.num_experts == 4
    params = llava.init_params(mcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert params["language_model"]["layers"]["gate_proj"].ndim == 4

    rng = np.random.default_rng(0)
    n_img = mcfg.num_image_tokens
    S = n_img + 12
    img = mcfg.vision.image_size

    def split():
        ids = rng.integers(10, 200, (2, S))
        ids[:, :n_img] = mcfg.image_token_id
        labels = ids.copy()
        labels[:, : n_img + 4] = -100
        return {
            "input_ids": ids.astype(np.int32),
            "attention_mask": np.ones((2, S), np.int32),
            "labels": labels.astype(np.int32),
            "pixel_values": rng.normal(size=(2, img, img, 3)).astype(np.float32),
        }

    apply_fn = make_apply_fn("llava", mcfg, compute_dtype=jnp.float32, attn_impl="xla")
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type="grad_diff_forget_ce_retain_ce",
        grad_accum=1, donate=False,
    )
    state = trainer.create_train_state(params, tx)
    state, metrics = step(state, None, None, {"forget": split(), "retain": split()})
    assert np.isfinite(float(metrics["loss"]))
    delta = float(jnp.max(jnp.abs(
        state.trainable["language_model"]["layers"]["router"]
        - params["language_model"]["layers"]["router"])))
    assert delta > 0  # expert routing trains through the VLM wrapper


def test_moe_int8_expert_stacks():
    """quantize_tree handles the 4-D [L,E,in,out] expert stacks (per-output-
    channel scales [L,E,1,out]); the MoE forward dequantizes them under the
    layer scan and stays close to fp32."""
    from multimodal_unlearning_tpu.utils.quantize import quantize_tree

    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=10000.0,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        num_experts=4, num_experts_per_tok=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_tree(params)
    for n in ("gate_proj", "up_proj", "down_proj"):
        leaf = qp["layers"][n]
        assert isinstance(leaf, dict) and leaf["q"].dtype == jnp.int8
        assert leaf["s"].shape == leaf["q"].shape[:-2] + (1, leaf["q"].shape[-1])

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 512, (2, 12)), jnp.int32)
    ref = llama.forward(params, cfg, ids, compute_dtype=jnp.float32)["logits"]
    q8 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    err = float(jnp.max(jnp.abs(q8 - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert np.isfinite(np.asarray(q8)).all()
    assert err < 0.05, err  # int8 per-channel quantization noise only


def test_moe_w8a8_dense_route():
    """INT8_COMPUTE + QTensor expert stacks: the dense route runs the int8
    MXU einsums (utils/quantize.int8_moe_*) — close to the W8A16 dequant
    path (activation-quantization noise only) and dx flows through the
    frozen stacks to the embeddings."""
    from multimodal_unlearning_tpu.utils.quantize import (
        int8_moe_down,
        int8_moe_up_group,
        quantize_leaf,
        quantize_tree,
    )

    rng = np.random.default_rng(7)
    # unit: grouped up/gate + batched down vs dequantized einsums
    x = jnp.asarray(rng.normal(size=(2, 8, 256)), jnp.float32)
    gate = jnp.asarray(rng.normal(size=(4, 256, 256)) * 256**-0.5, jnp.float32)
    up = jnp.asarray(rng.normal(size=(4, 256, 256)) * 256**-0.5, jnp.float32)
    down = jnp.asarray(rng.normal(size=(4, 256, 256)) * 256**-0.5, jnp.float32)
    qg, qu, qd = quantize_leaf(gate), quantize_leaf(up), quantize_leaf(down)
    g8, u8 = int8_moe_up_group(x, qg["q"], qg["s"], qu["q"], qu["s"])
    for y8, w in ((g8, gate), (u8, up)):
        ref = jnp.einsum("bsh,ehi->ebsi", x, w)
        err = float(jnp.max(jnp.abs(y8 - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 0.05, err
    ff = jnp.asarray(rng.normal(size=(4, 2, 8, 256)), jnp.float32)
    y8 = int8_moe_down(ff, qd["q"], qd["s"])
    ref = jnp.einsum("ebci,eih->ebch", ff, down)
    assert float(jnp.max(jnp.abs(y8 - ref)) / jnp.max(jnp.abs(ref))) < 0.05

    # end-to-end: forward under INT8_COMPUTE vs the W8A16 dequant path
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=10000.0,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        num_experts=4, num_experts_per_tok=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = quantize_tree(params)
    ids = jnp.asarray(rng.integers(1, 512, (2, 12)), jnp.int32)

    def nll(p):
        logits = llama.forward(p, cfg, ids, compute_dtype=jnp.float32)["logits"]
        return jnp.mean(jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
            logits, jnp.roll(ids, -1, 1)[..., None], -1)[..., 0])

    w16 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
    prev = llama.enable_int8_compute(True)
    try:
        w8 = llama.forward(qp, cfg, ids, compute_dtype=jnp.float32)["logits"]
        # float embeddings (the embedding table may itself be a QTensor)
        grads = jax.grad(lambda emb: nll(dict(qp, embed_tokens=emb)))(
            params["embed_tokens"])
    finally:
        llama.enable_int8_compute(prev)
    err = float(jnp.max(jnp.abs(w8 - w16)) / (jnp.max(jnp.abs(w16)) + 1e-9))
    assert err < 0.1, err
    assert np.isfinite(np.asarray(grads)).all()
    assert float(jnp.max(jnp.abs(grads))) > 0  # dx reaches the embeddings


def test_router_semantics_and_aux_loss():
    """Top-k renormalization (Mixtral) + Switch aux loss bounds."""
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    router = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    combine, probs = router_weights(h, router, 2)
    nz = np.asarray((combine > 0).sum(-1))
    assert (nz == 2).all()  # exactly k experts per token
    np.testing.assert_allclose(np.asarray(combine.sum(-1)), 1.0, atol=1e-6)
    aux = float(load_balance_aux_loss(probs, combine))
    assert aux >= 1.0 - 1e-3  # minimized at uniform routing

    assert expert_capacity(768, 8, 2, 1.25) == 240
    assert expert_capacity(4, 8, 2, 1.0) == 8  # lane floor


def test_moe_cli_expert_parallel(tmp_path):
    """nlp finetune + forget CLIs on mesh {data:2, fsdp:2, expert:2}: the
    expert stacks (student AND co-resident teacher) placed over the 'expert'
    axis via cli.common.apply_expert_parallel; losses finite, ckpt saved."""
    from multimodal_unlearning_tpu.cli import nlp_finetune, nlp_forget
    from multimodal_unlearning_tpu.config import load_config
    from multimodal_unlearning_tpu.config.registry import config_dir

    DATA = "synthetic:n_persons=40,qa_per_person=4"  # forget10 ≥ global batch 8

    def _cfg(name, **ov):
        cfg = load_config(config_dir() / "nlp", name)
        for k, v in ov.items():
            dict.__setitem__(cfg, k, v)
        dict.__setitem__(cfg["LoRA"], "r", 0)
        dict.__setitem__(cfg, "mesh", {"data": 2, "fsdp": 2, "expert": 2})
        return cfg

    ft = tmp_path / "ft"
    nlp_finetune.run(_cfg(
        "finetune", model_family="tiny-mixtral-test", data_path=DATA,
        split="full+tofu", batch_size=2, gradient_accumulation_steps=1,
        num_epochs=0.1, max_length=48, lr=1e-3, save_dir=str(ft), dtype="float32",
    ))
    assert (ft / "model.safetensors").exists()

    nlp_forget.run(_cfg(
        "forget", model_family="tiny-mixtral-test", model_path=str(ft),
        data_path=DATA, split="forget10", forget_loss="KL", batch_size=2,
        gradient_accumulation_steps=1, num_epochs=1, max_length=48,
        lr=1e-3, save_dir=str(tmp_path / "kl"), dtype="float32",
    ))
    assert (tmp_path / "kl" / "model.safetensors").exists()


def test_moe_serving_engine_matches_greedy(hf_mixtral):
    """MoE decoder through the continuous-batching serving engine, plain and
    speculative (chunk_decode verify rounds run the MoE MLP on k+1-token
    chunks): every request streams exactly its solo greedy tokens."""
    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate
    from multimodal_unlearning_tpu.serve import ServingEngine

    _, hf_model = hf_mixtral
    params = bridged_params(hf_model)
    rng = np.random.default_rng(6)
    specs = [(6, 5), (12, 7), (4, 4)]
    prompts = [rng.integers(3, 256, n).tolist() for n, _ in specs]

    def expected(prompt, max_new, bucket=16):
        sp = -(-len(prompt) // bucket) * bucket
        ids = np.zeros((1, sp), np.int32)
        mask = np.zeros((1, sp), np.int32)
        ids[0, sp - len(prompt):] = prompt
        mask[0, sp - len(prompt):] = 1
        return np.asarray(greedy_generate(
            params, OURS_CFG, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=max_new, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        ))[0]

    for spec_k in (0, 3):
        engine = ServingEngine(
            params, OURS_CFG, "llama", num_slots=2, max_len=128, chunk=4,
            bucket_multiple=16, pad_token_id=0, eos_token_id=None,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            speculate_k=spec_k,
        )
        reqs = [engine.submit(p, m) for p, (_, m) in zip(prompts, specs)]
        engine.drain(reqs)
        for req, prompt, (_, max_new) in zip(reqs, prompts, specs):
            np.testing.assert_array_equal(
                np.asarray(req.tokens), expected(prompt, max_new),
                err_msg=f"spec_k={spec_k}",
            )


def test_moe_decode_and_train_step(hf_mixtral):
    """Greedy decode (prefill+cache) matches HF generate; a grad_diff train
    step runs with finite loss through the tiny-mixtral-test registry family."""
    _, hf_model = hf_mixtral
    params = bridged_params(hf_model)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 256, (2, 10))

    from multimodal_unlearning_tpu.evaluation.generate import greedy_generate

    ours = np.asarray(greedy_generate(
        params, OURS_CFG, jnp.asarray(ids), jnp.ones((2, 10), jnp.int32),
        max_new_tokens=6, pad_token_id=0, eos_token_id=None,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32, attn_impl="xla",
    ))
    with torch.no_grad():
        hf = hf_model.generate(
            torch.tensor(ids), attention_mask=torch.ones(2, 10, dtype=torch.long),
            max_new_tokens=6, do_sample=False, pad_token_id=0,
        ).numpy()[:, 10:]
    np.testing.assert_array_equal(ours, hf)

    # train step through the registry family
    from multimodal_unlearning_tpu.cli.common import build_model_config
    from multimodal_unlearning_tpu.cli.mm_forget import make_apply_fn
    from multimodal_unlearning_tpu.config import get_model_identifiers
    from multimodal_unlearning_tpu.train import optim, trainer

    mcfg = build_model_config(get_model_identifiers("tiny-mixtral-test"))
    p = llama.init_params(mcfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    def split():
        i = rng.integers(1, 200, (2, 16)).astype(np.int32)
        lab = i.copy(); lab[:, :4] = -100
        return {"input_ids": i, "attention_mask": np.ones((2, 16), np.int32), "labels": lab}

    batch = {"forget": split(), "retain": split()}
    apply_fn = make_apply_fn("llama", mcfg, compute_dtype=jnp.float32, attn_impl="xla")
    tx = optim.make_optimizer("adamw", 1e-3)
    step = trainer.make_train_step(
        apply_fn, tx, loss_type="grad_diff_forget_ce_retain_ce", grad_accum=1, donate=False
    )
    state = trainer.create_train_state(p, tx)
    state, metrics = step(state, None, None, batch)
    assert np.isfinite(float(metrics["loss"]))
    # expert grads actually flow (router + expert stacks are trainable)
    for n in ("router", "gate_proj", "down_proj"):
        delta = float(jnp.max(jnp.abs(state.trainable["layers"][n] - p["layers"][n])))
        assert delta > 0, n
