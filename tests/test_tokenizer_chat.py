"""String-prompt / tokenizer / chat-template path through the real engine.

Reference anchor: /root/reference/example.py:7-26 (chat-template prompts
through LLM.generate) and llm_engine's tokenizer branch. Those paths need a
model DIR with tokenizer files, which CI never had — this builds a tiny
HF-format checkpoint + fast tokenizer in-test, so `add_request(str)`,
text decoding, and example.py's model-dir branch all execute in CI.
"""

import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")
tokenizers = pytest.importorskip("tokenizers")

from transformers import (PreTrainedTokenizerFast, Qwen3Config,  # noqa: E402
                          Qwen3ForCausalLM)

from nanovllm_tpu import LLM, SamplingParams  # noqa: E402

VOCAB_SIZE = 128


@pytest.fixture(scope="module")
def chat_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_qwen3_chat")
    torch.manual_seed(0)
    cfg = Qwen3Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=VOCAB_SIZE, max_position_embeddings=1024,
        rope_theta=10000.0, tie_word_embeddings=False, eos_token_id=2,
    )
    Qwen3ForCausalLM(cfg).eval().to(torch.float32).save_pretrained(
        d, safe_serialization=True)

    # Tiny WordLevel fast tokenizer whose ids all fit the model vocab.
    words = ["hello", "world", "introduce", "yourself", "list", "primes",
             "user", "assistant", "the", "a", "of", "and"]
    vocab = {"<unk>": 0, "<pad>": 1, "<eos>": 2, "<gen>": 3}
    vocab.update({w: i + 4 for i, w in enumerate(words)})
    tok = tokenizers.Tokenizer(
        tokenizers.models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   pad_token="<pad>", eos_token="<eos>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['role'] }} {{ m['content'] }} "
        "{% endfor %}{% if add_generation_prompt %}<gen>{% endif %}")
    fast.save_pretrained(d)
    return str(d)


def make_llm(model_dir, **over):
    kw = dict(max_model_len=256, max_num_batched_tokens=512, max_num_seqs=8,
              attn_backend="ref", dtype="float32", kvcache_block_size=16,
              num_kvcache_blocks=64, decode_steps=4)
    kw.update(over)
    return LLM(model_dir, **kw)


def test_string_prompt_end_to_end(chat_model_dir):
    llm = make_llm(chat_model_dir)
    assert llm.tokenizer is not None
    assert llm.config.eos == 2  # picked up from the tokenizer
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(["hello world", "introduce yourself"], sp,
                        use_tqdm=False)
    assert len(outs) == 2
    for o in outs:
        assert len(o["token_ids"]) == 6
        # decode ran (tokenizer branch of the result assembly)
        assert isinstance(o["text"], str)
    # String and pre-tokenized forms of the same prompt must match exactly.
    ids = llm.tokenizer.encode("hello world")
    outs2 = make_llm(chat_model_dir).generate([ids], sp, use_tqdm=False)
    assert outs2[0]["token_ids"] == outs[0]["token_ids"]


def test_chat_template_prompt(chat_model_dir):
    llm = make_llm(chat_model_dir)
    prompt = llm.tokenizer.apply_chat_template(
        [{"role": "user", "content": "list primes"}],
        tokenize=False, add_generation_prompt=True)
    assert "<gen>" in prompt
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    out = llm.generate([prompt], sp, use_tqdm=False)[0]
    assert len(out["token_ids"]) == 4


def test_eos_stops_generation(chat_model_dir):
    """Real-weights path honors the tokenizer's eos (no ignore_eos): the
    sequence must stop at or before max_tokens and never contain eos in a
    non-final position."""
    llm = make_llm(chat_model_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=32)
    out = llm.generate(["hello world"], sp, use_tqdm=False)[0]
    toks = out["token_ids"]
    assert 1 <= len(toks) <= 32
    assert 2 not in toks[:-1]


def test_example_py_model_dir_smoke(chat_model_dir):
    """example.py's model-dir branch (chat-template prompts) end-to-end."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys, runpy\n"
        f"sys.argv = ['example.py', '--model', {chat_model_dir!r},"
        " '--attn-backend', 'ref', '--max-tokens', '4']\n"
        "runpy.run_path('example.py', run_name='__main__')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Completion:" in r.stdout
