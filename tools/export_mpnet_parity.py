#!/usr/bin/env python3
"""Export sentence-transformers/all-mpnet-base-v2 (the reference's embedding
model, backend/config.py:62) to the deployment artifact pair
graft.onnx.OnnxEmbedder consumes -- model.onnx + vocab.txt -- plus a PINNED
parity report, so the from-scratch JVM ONNX runtime's fidelity claim is
checkable against real pretrained weights outside this sandbox.

The TinyMpnet harness (graft.onnx.Export) already validates the runtime
against an mpnet-SHAPED seeded model to <2e-5/dim; what it cannot exercise
is the numerical range of real pretrained weights. This script closes that
gap wherever torch+transformers are installed:

    python3 tools/export_mpnet_parity.py /path/outdir
    # then, JVM side (same machine or after copying outdir):
    sbt "runMain graft.onnx.ParityCheck /path/outdir"

The report (parity.tsv) carries the torch-side mean-pooled, L2-normalized
sentence embeddings for a fixed probe set spanning: plain prose, long
truncated input, subword-heavy tokens, unicode, repeated tokens, and a
single-word edge. ParityCheck re-embeds them through OnnxEmbedder (same
pooling contract: masked mean over last_hidden_state, then L2 normalize)
and gates on cosine >= 0.9995 and max|diff| <= 5e-3 per sentence --
loose enough for kernel-order float drift, tight enough that any real
tokenizer/op defect fails loudly.

Requires: torch, transformers (any recent versions). No network beyond the
HuggingFace model download.
"""
import os
import sys

PROBES = [
    "The quick brown fox jumps over the lazy dog.",
    "Spark engines score vectors with codegen expressions.",
    "word",
    "Unicode check: café naïve über straße — ok?",
    "repeated repeated repeated repeated repeated repeated repeated",
    "Subword-heavy: electroencephalographically uncharacteristically antidisestablishmentarianism.",
    "Numbers 12345 and symbols #@!% mix with text.",
    " ".join(f"token{i} filler content for a long sequence" for i in range(40)),
    "Short.",
    "A second plain sentence to anchor the middle of the batch.",
]


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    out = sys.argv[1]
    os.makedirs(out, exist_ok=True)
    import torch
    from transformers import AutoModel, AutoTokenizer

    name = "sentence-transformers/all-mpnet-base-v2"
    tok = AutoTokenizer.from_pretrained(name)
    model = AutoModel.from_pretrained(name).eval()

    # vocab.txt in HF layout: line number = token id
    vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
    with open(os.path.join(out, "vocab.txt"), "w", encoding="utf-8") as f:
        for t, _ in vocab:
            f.write(t + "\n")

    enc = tok(PROBES, padding=True, truncation=True, max_length=128,
              return_tensors="pt")
    torch.onnx.export(
        model, (enc["input_ids"], enc["attention_mask"]),
        os.path.join(out, "model.onnx"),
        input_names=["input_ids", "attention_mask"],
        output_names=["last_hidden_state"],
        dynamic_axes={"input_ids": {0: "batch", 1: "seq"},
                      "attention_mask": {0: "batch", 1: "seq"},
                      "last_hidden_state": {0: "batch", 1: "seq"}},
        opset_version=14)

    with torch.no_grad():
        h = model(**enc).last_hidden_state  # (b, s, 768)
    m = enc["attention_mask"].unsqueeze(-1).float()
    pooled = (h * m).sum(1) / m.sum(1).clamp(min=1e-9)
    normed = torch.nn.functional.normalize(pooled, dim=1)

    with open(os.path.join(out, "parity.tsv"), "w", encoding="utf-8") as f:
        f.write(f"dim\t{normed.shape[1]}\n")
        for s, v in zip(PROBES, normed.tolist()):
            assert "\t" not in s
            f.write(s + "\t" + ",".join(f"{x:.8f}" for x in v) + "\n")
    print(f"wrote model.onnx, vocab.txt, parity.tsv to {out}")
    print("verify with: sbt 'runMain graft.onnx.ParityCheck " + out + "'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
