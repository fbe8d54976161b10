#!/usr/bin/env python3
"""Export a real sentence-transformers CrossEncoder reranker (default:
cross-encoder/ms-marco-MiniLM-L-6-v2, the standard public MS MARCO
reranker) to the artifact pair graft.onnx.OnnxCrossEncoder consumes --
model.onnx (pair logits) + vocab.txt -- plus a PINNED pair-parity report,
so the from-scratch JVM runtime's cross-encoder path is checkable against
real pretrained weights outside this sandbox.

The in-sandbox validation (graft.onnx.TinyMpnet.writeCrossTo) pins the
pair framing, in-graph pooling/head wiring and padding invariance against
an independent composition; what it cannot exercise is real weights. This
script closes that gap wherever torch+transformers are installed:

    python3 tools/export_crossencoder_parity.py /path/outdir
    # then, JVM side (same machine or after copying outdir):
    sbt "runMain graft.onnx.ParityCheck /path/outdir"

(ParityCheck auto-detects cross_parity.tsv and runs the pair gate.)

The report carries torch-side relevance logits for fixed (query, doc)
pairs spanning: on-topic, off-topic, near-duplicate-of-query, long
truncated docs and unicode. The JVM side re-scores through
OnnxCrossEncoder (same [CLS] q [SEP] d [SEP] framing) and gates on
|diff| <= 5e-2 per pair -- MS MARCO logits span roughly [-11, 11], so
this is ~0.2% of the range, loose enough for kernel-order float drift
and tight enough that a tokenizer/head defect fails loudly.

NOTE: BERT-family cross-encoders also declare a token_type_ids input;
torch.onnx.export with segment ids passed as zeros folds them into the
graph as an input -- pass all-zero segments (query/doc distinction comes
from position in practice for MiniLM rerankers trained with it; if your
model NEEDS real segment ids, export with them and extend
OnnxCrossEncoder's feed map accordingly).

Requires: torch, transformers. No network beyond the model download.
"""
import os
import sys

PAIRS = [
    ("what is a spark shuffle", "A shuffle redistributes data across partitions between stages."),
    ("what is a spark shuffle", "The Eiffel Tower is located in Paris, France."),
    ("what is a spark shuffle", "what is a spark shuffle"),
    ("best pizza dough recipe", "Mix flour, water, salt and yeast; rest overnight for flavor."),
    ("best pizza dough recipe", "Quantum entanglement links particle states across distance."),
    ("unicode café naïve", "Straße tokens with diacritics — über test."),
    ("long doc truncation", " ".join(f"filler{i} content padding sequence" for i in range(80))),
    ("single", "word"),
]


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    out = args[0]
    name = args[1] if len(args) > 1 else "cross-encoder/ms-marco-MiniLM-L-6-v2"
    os.makedirs(out, exist_ok=True)
    import torch
    from transformers import AutoModelForSequenceClassification, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(name)
    model = AutoModelForSequenceClassification.from_pretrained(name).eval()

    vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
    with open(os.path.join(out, "vocab.txt"), "w", encoding="utf-8") as f:
        for t, _ in vocab:
            f.write(t + "\n")

    qs = [q for q, _ in PAIRS]
    ds = [d for _, d in PAIRS]
    enc = tok(qs, ds, padding=True, truncation=True, max_length=128,
              return_tensors="pt")

    class LogitsOnly(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, input_ids, attention_mask):
            return self.m(input_ids=input_ids, attention_mask=attention_mask).logits

    torch.onnx.export(
        LogitsOnly(model), (enc["input_ids"], enc["attention_mask"]),
        os.path.join(out, "model.onnx"),
        input_names=["input_ids", "attention_mask"],
        output_names=["logits"],
        dynamic_axes={"input_ids": {0: "batch", 1: "seq"},
                      "attention_mask": {0: "batch", 1: "seq"},
                      "logits": {0: "batch"}},
        opset_version=14)

    with torch.no_grad():
        logits = LogitsOnly(model)(enc["input_ids"], enc["attention_mask"])
    flat = logits.reshape(-1).tolist()

    with open(os.path.join(out, "cross_parity.tsv"), "w", encoding="utf-8") as f:
        f.write("query\tdoc\tlogit\n")
        for (q, d), v in zip(PAIRS, flat):
            assert "\t" not in q and "\t" not in d
            f.write(f"{q}\t{d}\t{v:.6f}\n")
    print(f"wrote model.onnx, vocab.txt, cross_parity.tsv to {out}")
    print("verify with: sbt 'runMain graft.onnx.ParityCheck " + out + "'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
