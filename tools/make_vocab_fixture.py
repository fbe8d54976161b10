#!/usr/bin/env python3
"""Generate fixtures/vocab.txt — a ~1k-entry WordPiece vocabulary in the
standard HF vocab.txt layout (one piece per line, `##` marks continuation).

Composition mirrors a real BERT-family vocab at miniature scale:
  - every single char a-z 0-9 plus its ## form (so every ASCII word HAS a
    tokenization — real vocabs guarantee this for their alphabet);
  - common English + engine-domain full words. A few corpus words are
    deliberately ABSENT as full words (window, table, data, customer,
    column, vector, filter, query) so the greedy matcher must split them
    via the multi-char pieces below — that's what makes c1_wordpiece's
    oracle exercise real longest-match behavior, not a dictionary lookup;
  - their split pieces (wind/##ow, ta/##ble, da/##ta, ...) plus common
    suffix pieces;
  - deterministic two-char syllable pieces to pad to ~1k entries, like the
    subword tail of a trained vocab.

Deterministic: byte-identical output on every run.
"""

CHARS = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [str(d) for d in range(10)]

WORDS = """the a an and or of to in is are was were be been has have had do does did
not no yes if then else for while with without over under near far by at on off
up down out into from this that these those it its they them he she we you i
one two three four five six seven eight nine ten first last next prev new old
big small fast slow high low long short wide deep hot cold good bad best worst
key value part hash merge batch line sort order join group row scan agg spark
stream code text word token count chunk page file path name type size time date
user event state store index shard split train test set list map tree graph
node edge link core disk read write load save send recv open close start stop
run walk make take give get put add sub mul div min max sum avg mean mode
plan cost rule scale skew salt probe build bucket range bound limit offset
fetch push pull emit drop keep skip seek find match parse print log trace
point score rank grade level tier class label tag flag mark note hint clue
work job task unit step stage phase round cycle loop pass fail error warn
true false null void main args call func proc expr stmt block scope frame
heap stack queue deque ring pool cache miss hit rate ratio pct frac delta
alpha beta gamma theta sigma omega prime twin triple quad penta hexa octa
north south east west left right top bottom front back side center middle
red green blue black white gray pink cyan teal lime navy gold silver bronze
cat dog bird fish tree leaf root stem seed rain snow wind fire earth water
sky sea lake hill rock sand clay iron coal salt milk rice corn bean leafs""".split()

SPLITS = ["wind", "##ow", "ta", "##ble", "da", "##ta", "custom", "##er",
          "col", "##umn", "vec", "##tor", "fil", "##ter", "que", "##ry",
          "distrib", "##uted", "pipe", "##line", "proc", "##ess"]

SUFFIXES = ["##s", "##ed", "##ing", "##er", "##est", "##ly", "##tion",
            "##ment", "##ness", "##ize", "##ized", "##al", "##ic", "##ous",
            "##ful", "##less", "##able", "##ity", "##ism", "##ist"]

# deterministic two-char subword tail: onset-vowel and vowel-coda patterns
ONSETS = list("bcdfghjklmnpqrstvwz")
VOWELS = list("aeiou")


def main():
    pieces = []
    seen = set()

    def add(p):
        if p and p not in seen:
            seen.add(p)
            pieces.append(p)

    for c in CHARS:
        add(c)
    for c in CHARS:
        add("##" + c)
    for w in WORDS:
        add(w)
    for p in SPLITS:
        add(p)
    for p in SUFFIXES:
        add(p)
    for o in ONSETS:
        for v in VOWELS:
            add("##" + o + v)
            add("##" + v + o)
    for o in ONSETS:
        for v in VOWELS:
            add(o + v)
    for o in ONSETS:
        for v in VOWELS:
            add("##" + o + v + "n")
            add("##" + o + v + "r")

    with open("fixtures/vocab.txt", "w") as f:
        f.write("\n".join(pieces) + "\n")
    print(f"wrote fixtures/vocab.txt ({len(pieces)} pieces)")


if __name__ == "__main__":
    main()
