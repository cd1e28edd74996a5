"""ECO AttackedModel (reference: methods/eco/attk_model.py:38-128).

Composes a decoder with the prompt/token classifiers: on every call or
generate, classify the prompts, build a per-token corruption pattern, and
corrupt the *embedding activations* of flagged tokens before the decoder
runs.  The reference registers a forward hook on ``model.embed_tokens``
(attack_module, config/llama2-7b.yaml:2); functionally that hook is a
transform of the embedding output — here it is exactly that: embeddings are
computed, corrupted, and passed as ``inputs_embeds``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_unlearning_tpu.methods.eco.classifier import (
    CorpusPromptClassifier,
    CorpusTokenClassifier,
)
from multimodal_unlearning_tpu.methods.eco.corrupt import corrupt_methods
from multimodal_unlearning_tpu.models import llama


class AttackedModel:
    def __init__(
        self,
        params,
        model_cfg: llama.LlamaConfig,
        tokenizer,
        prompt_classifier,
        token_classifier,
        *,
        corrupt_method: str = "zero_out_top_k",
        corrupt_args: dict | None = None,
        threshold: float = 0.999,
        compute_dtype=jnp.float32,
        seed: int = 0,
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.prompt_classifier = prompt_classifier
        self.token_classifier = token_classifier
        self.corrupt_fn = corrupt_methods[corrupt_method]
        self.corrupt_args = corrupt_args or {}
        self.threshold = threshold
        self.compute_dtype = compute_dtype
        self.key = jax.random.PRNGKey(seed)

    def _pattern(self, prompts: list[str], S: int) -> np.ndarray:
        """[B, S] attack mask: prompt gate × token labels (attk_model.py:69-88)."""
        gate = self.prompt_classifier.predict(prompts, threshold=self.threshold)
        token_labels = self.token_classifier.predict_target_token_labels(prompts, self.tokenizer)
        pat = np.zeros((len(prompts), S), np.int32)
        for r, (g, labels) in enumerate(zip(gate, token_labels)):
            if not g:
                continue
            lab = labels[-S:] if len(labels) >= S else [0] * (S - len(labels)) + labels
            pat[r] = lab
        return pat

    def corrupted_embeds(self, input_ids, prompts):
        embeds = jnp.take(self.params["embed_tokens"], input_ids, axis=0).astype(self.compute_dtype)
        pat = jnp.asarray(self._pattern(prompts, input_ids.shape[1]))
        self.key, sub = jax.random.split(self.key)
        return self.corrupt_fn(embeds, pat, key=sub, **self.corrupt_args)

    def __call__(self, input_ids, attention_mask=None, labels=None, prompts=None, **kw):
        """Forward with corruption (kwargs ``prompts``/``answers`` accepted and
        stripped, like methods/eco/model.py:60-75)."""
        kw.pop("answers", None)
        prompts = prompts or [self.tokenizer.decode(r, skip_special_tokens=True) for r in np.asarray(input_ids)]
        embeds = self.corrupted_embeds(jnp.asarray(input_ids), prompts)
        return llama.forward(
            self.params, self.model_cfg,
            inputs_embeds=embeds,
            attention_mask=None if attention_mask is None else jnp.asarray(attention_mask),
            compute_dtype=self.compute_dtype,
        )

    def generate(self, input_ids, attention_mask, *, max_new_tokens: int, prompts=None, **kw):
        """Greedy generation from corrupted prompt embeddings: the corrupted
        prefill fills the KV cache; decode proceeds normally."""
        kw.pop("answers", None)
        input_ids = jnp.asarray(input_ids)
        attention_mask = jnp.asarray(attention_mask)
        B, S = input_ids.shape
        prompts = prompts or [self.tokenizer.decode(r, skip_special_tokens=True) for r in np.asarray(input_ids)]
        embeds = self.corrupted_embeds(input_ids, prompts)

        # Round the cache length up to a lane multiple so the Pallas decode
        # kernel (whose BlockSpec makes Smax the minor-most block dim) stays
        # eligible; matches greedy_generate's alignment.
        Smax = -(-(S + max_new_tokens) // 128) * 128
        cache = llama.init_kv_cache(self.model_cfg, B, Smax, dtype=self.compute_dtype)
        kv_valid = jnp.zeros((B, Smax), jnp.int32).at[:, :S].set(attention_mask)
        out = llama.forward(
            self.params, self.model_cfg, inputs_embeds=embeds,
            attention_mask=attention_mask, kv_cache=cache, cache_offset=0,
            kv_valid_mask=kv_valid, compute_dtype=self.compute_dtype,
        )
        cache = out["kv_cache"]
        tok = jnp.argmax(out["logits"][:, -1, :], axis=-1)
        prompt_len = jnp.sum(attention_mask, axis=-1)
        tokens = [np.asarray(tok)]
        finished = np.zeros(B, bool)
        eos = self.tokenizer.eos_token_id
        for t in range(max_new_tokens - 1):
            kv_valid = kv_valid.at[:, S + t].set(1)
            out = llama.forward(
                self.params, self.model_cfg, tok[:, None],
                attention_mask=jnp.ones((B, 1), jnp.int32),
                positions=(prompt_len + t)[:, None],
                kv_cache=cache, cache_offset=S + t, kv_valid_mask=kv_valid,
                compute_dtype=self.compute_dtype,
            )
            cache = out["kv_cache"]
            tok = jnp.argmax(out["logits"][:, -1, :], axis=-1)
            step_tok = np.asarray(tok)
            finished |= step_tok == eos
            step_tok = np.where(finished, self.tokenizer.pad_token_id, step_tok)
            tokens.append(step_tok)
        return np.stack(tokens, axis=1)


def get_eco_model(
    params, model_cfg, tokenizer, forget_prompts, entities,
    *, corrupt_method="zero_out_top_k", dims=1000, threshold=0.999,
    compute_dtype=jnp.float32,
    prompt_classifier_path: str | None = None,
    token_classifier_path: str | None = None,
):
    """llama_setup defaults (methods/eco/main.py:6-45): zero_out_top_k,
    dims=1000, prompt threshold .999.

    With ``prompt_classifier_path``/``token_classifier_path`` the detectors
    are the *learned* HF pipeline models (reference parity — train them
    locally with methods/eco/train_classifiers.py); otherwise the hub-free
    corpus heuristics."""
    from multimodal_unlearning_tpu.methods.eco.classifier import (
        HFPipelineBackend,
        HFTokenPipelineBackend,
    )

    dims = min(dims, model_cfg.hidden_size)
    prompt_clf = (
        HFPipelineBackend(prompt_classifier_path)
        if prompt_classifier_path
        else CorpusPromptClassifier(forget_prompts, entities)
    )
    token_clf = (
        HFTokenPipelineBackend(token_classifier_path)
        if token_classifier_path
        else CorpusTokenClassifier(entities)
    )
    return AttackedModel(
        params, model_cfg, tokenizer,
        prompt_clf,
        token_clf,
        corrupt_method=corrupt_method,
        corrupt_args={"dims": dims},
        threshold=threshold,
        compute_dtype=compute_dtype,
    )
