"""CLI smoke tests: ``python -m diffusion_llm_rs_tpu <cmd>``.

The reference's release workflow packages a ``diffusion-llm-rs`` binary that
no crate defines (`release.yml:58-63`); `__main__.py` is the working
realization. All commands run against the shipped pretrained anchor
(6L/256d, T=100) so outputs are corpus-plausible, on the CPU test mesh.
"""

import json

import pytest

from diffusion_llm_rs_tpu.__main__ import main


def run(capsys, *argv):
    main(list(argv))
    return capsys.readouterr().out


def test_generate(capsys):
    out = run(capsys, "generate", "--prompt", "the quick cat",
              "--max-length", "2")
    assert isinstance(out, str) and out.strip()


def test_ppl_json(capsys):
    out = run(capsys, "ppl", "--text", "cat runs near the river", "--t", "10")
    rec = json.loads(out)
    assert rec["perplexity"] > 0 and rec["t"] == 10


def test_ppl_quantized_is_finite(capsys):
    out = run(capsys, "ppl", "--text", "dog jumps over stone", "--t", "10",
              "--bits", "8")
    rec = json.loads(out)
    assert rec["perplexity"] > 0 and rec["bits"] == 8


def test_ingest(tmp_path, capsys):
    f = tmp_path / "corpus.txt"
    f.write_text("bird hunts near the forest then sleeps")
    out = run(capsys, "ingest", "--file", str(f))
    rec = json.loads(out)
    assert rec["tokens"] > 0 and rec["stored"] >= 0


def test_serve(capsys):
    out = run(capsys, "serve", "--requests", "2", "--slots", "2",
              "--seq-len", "16", "--steps", "3", "--page-size", "16")
    rec = json.loads(out)
    assert rec["requests"] == 2 and rec["tokens_per_sec"] > 0
    assert rec["gen_tokens"] == 2 * 16


def test_quantize_save_roundtrip(tmp_path, capsys):
    stem = str(tmp_path / "q4")
    out = run(capsys, "quantize", "--bits", "4", "--out", stem)
    rec = json.loads(out)
    assert rec["bits"] == 4 and rec["param_bytes"] > 0
    assert (tmp_path / "q4.npz").exists()
    # the saved stem must load back through --checkpoint (ADVICE r3: the
    # metadata needs config + tokenizer, not just {bits, method})
    out = run(capsys, "ppl", "--checkpoint", stem,
              "--text", "cat runs near the river", "--t", "10")
    rec = json.loads(out)
    assert rec["perplexity"] > 0
    assert rec["bits"] == 4  # inferred from the loaded quantized leaves


def test_unknown_command_exits():
    with pytest.raises(SystemExit):
        main(["not-a-command"])
