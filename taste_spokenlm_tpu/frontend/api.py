"""High-level inference API: the full speech-continuation pipeline.

Host-side orchestration of `inference_completion`
(/root/reference/taste_speech/modeling_taste.py:1663-1791): the jitted joint
decode runs on device (models/taste.generate_completion); this module does
the tokenizer round trip (decode generated llm tokens -> words -> re-tokenize
with the asr tokenizer, sharing word ids), combines the conditioning prefix
with the generated continuation, and calls the jitted synthesis tail
(taste indices + asr tokens -> waveform).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np

from taste_spokenlm_tpu.models.sampler import SamplerConfig, build_sampler_tables
from taste_spokenlm_tpu.models.taste import TasteForCausalLM


def _pad_to(x: np.ndarray, n: int, value=0) -> np.ndarray:
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=value)


def build_instruct_ids(llm_tokenizer, system_prompt: Optional[str] = None):
    """Chat-template wrapper ids for `conditional_mode='instruct'`.

    The reference consumes caller-supplied `instruct_prefix_ids` /
    `instruct_suffix_ids` around the fused audio prefix
    (modeling_taste.py:1101-1124) plus a `stop_id` that ends generation
    without being emitted (modules_taste/sampler.py:75-140).  Build them
    from the tokenizer's own chat template: render a user turn whose
    content is a sentinel, split the rendered text around it, and encode
    the two halves — prefix = everything before the audio content
    (template header), suffix = everything after (the assistant-generation
    header).  stop_id = the template's end-of-turn/eos id.

    Returns (prefix_ids [P] int32, suffix_ids [S] int32, stop_id int).
    """
    marker = "␟"  # SYMBOL FOR UNIT SEPARATOR: survives any template
    msgs = []
    if system_prompt:
        msgs.append({"role": "system", "content": system_prompt})
    msgs.append({"role": "user", "content": marker})
    try:
        text = llm_tokenizer.apply_chat_template(
            msgs, tokenize=False, add_generation_prompt=True)
    except Exception:
        # tokenizer without a chat template: llama-2-instruct style wrapper
        sys_part = f"<<SYS>>\n{system_prompt}\n<</SYS>>\n\n" \
            if system_prompt else ""
        text = f"[INST] {sys_part}{marker} [/INST]"
    pre, _, post = text.partition(marker)
    prefix = list(llm_tokenizer.encode(pre, add_special_tokens=False))
    suffix = list(llm_tokenizer.encode(post, add_special_tokens=False))
    if not prefix:  # generate() embeds the prefix; keep it non-empty
        bos = getattr(llm_tokenizer, "bos_token_id", None)
        prefix = [bos if bos is not None else 0]
    if not suffix:
        suffix = list(prefix[-1:])
    stop_id = getattr(llm_tokenizer, "eos_token_id", None)
    return (np.asarray(prefix, np.int32), np.asarray(suffix, np.int32),
            int(stop_id) if stop_id is not None else -1)


@dataclass
class CompletionPipeline:
    model: TasteForCausalLM
    variables: Any
    llm_tokenizer: Any
    asr_tokenizer: Any
    tables: Optional[Dict] = None
    max_decode_steps: int = 256
    max_asr_tokens: int = 128
    max_words: int = 128
    max_speech_steps: int = 512
    mel_len_max: int = 512

    def __post_init__(self):
        if self.tables is None:
            import jax.numpy as jnp
            vocab = self.model.config.spoken_lm.llama.vocab_size
            t = build_sampler_tables(self.llm_tokenizer, vocab)
            self.tables = {k: jnp.asarray(v) for k, v in t.items()}

    def __call__(
        self,
        speaker_embeds: np.ndarray,           # [1, spk]
        llm_token_ids: np.ndarray,            # [1, T]
        llm_word_ids: np.ndarray,             # [1, T]
        llm_indices: np.ndarray,              # [1, T, L]
        asr_token_ids: Optional[np.ndarray] = None,   # [1, Ta]
        asr_word_ids: Optional[np.ndarray] = None,
        conditional_mode: str = "audio",
        out_generated_part_only: bool = False,
        extra_words: int = 8,
        text_top_p: float = 0.3,
        taste_top_p: float = 0.0,
        temperature: float = 0.5,
        repetition_penalty: float = 1.1,
        seed: int = 0,
        output_text_only: bool = False,
        instruct_prefix_ids: Optional[np.ndarray] = None,
        instruct_suffix_ids: Optional[np.ndarray] = None,
        stop_id: int = -1,
        system_prompt: Optional[str] = None,
    ) -> Dict[str, Any]:
        import jax
        import jax.numpy as jnp

        cfg = self.model.config
        instruct_kwargs = {}
        if conditional_mode == "instruct":
            if instruct_prefix_ids is None:
                instruct_prefix_ids, instruct_suffix_ids, tmpl_stop = \
                    build_instruct_ids(self.llm_tokenizer, system_prompt)
                if stop_id < 0:
                    stop_id = tmpl_stop
            instruct_kwargs = dict(
                instruct_prefix_ids=jnp.asarray(instruct_prefix_ids,
                                                jnp.int32),
                instruct_suffix_ids=jnp.asarray(instruct_suffix_ids,
                                                jnp.int32))
        scfg = SamplerConfig(
            delay=cfg.spoken_lm.delay, delay_level=cfg.spoken_lm.delay_level,
            extra_words=extra_words, text_top_p=text_top_p,
            taste_top_p=taste_top_p, text_temperature=temperature,
            repetition_penalty=repetition_penalty,
            stop_id=stop_id if conditional_mode == "instruct" else -1,
            has_prefix=conditional_mode == "audio")

        t = llm_token_ids.shape[1]
        gen = self.model.apply(
            self.variables, jax.random.PRNGKey(seed), scfg, self.tables,
            jnp.asarray(llm_indices), jnp.asarray(llm_token_ids),
            jnp.asarray([t], np.int32), jnp.asarray(llm_word_ids),
            conditional_mode, self.max_decode_steps, **instruct_kwargs,
            method=TasteForCausalLM.generate_completion)

        n = int(gen["num_tokens"][0])
        n_taste = int(gen["num_taste_words"][0])
        gen_ids = np.asarray(gen["llm_token_ids"])[0, :n]
        gen_words = np.asarray(gen["llm_word_ids"])[0, :n]
        gen_taste = np.asarray(gen["taste_indices"])[0, :n_taste]

        generated_text = self.llm_tokenizer.decode(gen_ids.tolist()).strip()
        if output_text_only:
            return {"generated_text": generated_text}

        # re-tokenize the generated words with the asr tokenizer, sharing ids
        words = [" " + w for w in re.split(r"\s", generated_text) if w]
        gen_asr_ids, gen_asr_words = [], []
        for i, word in enumerate(words):
            for tid in self.asr_tokenizer.encode(word, add_special_tokens=False):
                gen_asr_ids.append(tid)
                gen_asr_words.append(i)
        gen_asr_ids = np.asarray(gen_asr_ids, np.int32)
        gen_asr_words = np.asarray(gen_asr_words, np.int32)

        # dense per-word taste for the combined sequence
        if out_generated_part_only or conditional_mode != "audio":
            asr_ids, asr_words = gen_asr_ids, gen_asr_words
            word_taste = gen_taste
        else:
            # original prefix: word-start rows of llm_indices are the per-word
            # taste (others are -1)
            orig = np.asarray(llm_indices[0])
            valid = orig[:, 0] >= 0
            orig_word_taste = orig[valid]
            base = asr_word_ids[0].max() + 1
            asr_ids = np.concatenate([asr_token_ids[0], gen_asr_ids])
            asr_words = np.concatenate([asr_word_ids[0],
                                        base + gen_asr_words])
            word_taste = np.concatenate([orig_word_taste, gen_taste], axis=0)

        na = min(len(asr_ids), self.max_asr_tokens)
        nw = word_taste.shape[0]
        asr_ids_p = _pad_to(asr_ids[:na], self.max_asr_tokens)[None]
        asr_words_p = _pad_to(np.minimum(asr_words[:na], max(nw - 1, 0)),
                              self.max_asr_tokens)[None]
        taste_p = _pad_to(word_taste, max(self.max_words, nw))[None]

        out = self.model.apply(
            self.variables, jax.random.PRNGKey(seed + 1),
            jnp.asarray(speaker_embeds), jnp.asarray(taste_p),
            jnp.asarray(asr_ids_p), jnp.asarray([na], np.int32),
            jnp.asarray(asr_words_p),
            max_speech_steps=self.max_speech_steps,
            mel_len_max=self.mel_len_max,
            method=TasteForCausalLM.synthesize_from_taste)

        return {
            "generated_text": generated_text,
            "generated_llm_token_ids": gen_ids,
            "generated_word_ids": gen_words,
            "generated_taste": gen_taste,
            "speech_token_ids": np.asarray(out["speech_token_ids"]),
            "speech_token_lengths": np.asarray(out["speech_token_lengths"]),
            "waveform": np.asarray(out["waveform"]),
            "waveform_lengths": np.asarray(out["waveform_lengths"]),
        }
