#!/usr/bin/env python3
"""Differential test of graft's MATCH grammar against SQLite FTS5 itself.

Generates a deterministic pseudo-random battery of MATCH queries (plus a
hand-picked edge list), runs them through BOTH engines on the same
five-document corpus, and compares:
  - error-ness (both error or both succeed; message TEXT may differ), and
  - the candidate ROW SET on success (ranking order is the documented
    accepted divergence, so sets, not sequences).

Dev tooling only (the shipped library has no Python dependency). Usage:
    python3 tools/fts5_diff.py [n_random]
Runs `sbt runMain graft.FtsDiff` itself; exits non-zero on any mismatch.

Known modeled-divergence allowances (documented in FtsMatch's scaladoc):
none — every behavior class the generator covers must match exactly.
"""
import json, random, sqlite3, subprocess, sys, tempfile, os

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick dog barks at the brown cat",
    "foxes are quick and dogs are lazy",
    "the cat sat on the mat",
    "quick words travel far and quick deeds farther",
]

WORDS = ["the", "quick", "brown", "fox", "dog", "cat", "lazy", "are",
         "far", "deeds", "qui", "fo", "de", "xyz", "or", "near"]


def gen_atom(rng):
    r = rng.random()
    if r < 0.45:
        w = rng.choice(WORDS)
        return w + ("*" if rng.random() < 0.3 else "")
    if r < 0.8:
        n = rng.randint(1, 3)
        ph = " ".join(rng.choice(WORDS) for _ in range(n))
        if rng.random() < 0.1:  # r18: embedded doubled-quote escape
            k = rng.randrange(len(ph) + 1)
            ph = ph[:k] + '""' + ph[k:]
        return f'"{ph}"' + ("*" if rng.random() < 0.25 else "")
    if r < 0.9:
        # + chain
        n = rng.randint(2, 3)
        parts = []
        for _ in range(n):
            w = rng.choice(WORDS)
            parts.append(w + ("*" if rng.random() < 0.2 else ""))
        return " + ".join(parts)
    return '""'


def gen_unit(rng, depth):
    r = rng.random()
    if r < 0.12 and depth < 2:
        return "(" + gen_expr(rng, depth + 1) + ")"
    if r < 0.24:
        ops = " ".join(gen_atom(rng) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.5:
            return f"NEAR({ops}, {rng.choice([0, 1, 3, 5, 10, 2147483648, 99999999999])})"
        return f"NEAR({ops})"
    if r < 0.32:
        return "^" + gen_atom(rng)
    if r < 0.38:
        return "content:" + gen_atom(rng)
    return gen_atom(rng)


def gen_expr(rng, depth=0):
    parts = [gen_unit(rng, depth)]
    for _ in range(rng.randint(0, 2)):
        op = rng.choice(["", " AND ", " OR ", " NOT "])
        nxt = gen_unit(rng, depth)
        parts.append((op if op else " ") + nxt)
    return "".join(parts)


EDGE = [
    'quick *', '^ quick', '* quick', '*', '^', 'quick ^', '"a b" *',
    '(quick) *', 'quick OR *', 'the + qui*', 'qui* + brown',
    '"the qui"* + brown', '+quick', 'quick + + dog', '""', '""*',
    '"" OR quick', 'quick ""', '"" NOT quick', 'quick NOT ""',
    'NEAR("")', 'NEAR(quick)', 'NEAR', 'NEAR dog', 'NEAR AND dog',
    'near(quick dog)', 'quick (dog)', '(dog OR cat) quick',
    'quick AND (dog OR cat)', 'NEAR(quick dog, 2147483648)',
    'NEAR(quick dog, 99999999999)', 'surah:5', 'content:the + quick',
    '^"" OR quick', 'fox*es', 'quick*dog', '"AND"', '"*"',
    'mercy or fox', 'AND', 'OR', 'NOT', 'alpha AND (beta OR gamma)',
    # r17 fuzz-found precedence/empty-phrase regressions (kept forever)
    'lazy NOT the* "xyz qui qui"', 'lazy NOT far "qui"',
    '((dog NOT "cat cat" deeds*)) OR (are* AND ^"fox" AND fox*)',
    'content:quick* NOT NEAR(fo + fox far dog* + lazy*) "or"',
    '(brown* AND "") AND "" OR "fox qui"*', 'quick NOT "dog"* AND ""',
    'content:are "" NOT ("are far")', '"far dog fo"* OR "" AND content:deeds',
    'lazy* NEAR("", 5)', '^"" AND cat',
    '((^"") AND ("quick")) NOT fox* NOT ^"qui deeds"*',
    'far* NOT NEAR(near* near) brown*', 'cat NOT near* or',
    '(content:"" AND lazy) AND quick* NOT (NEAR("dog xyz or" '
    '"deeds brown fox", 5) OR ("" AND "near near") AND dog)',
    'alpha NOT beta gamma', 'alpha NOT beta AND gamma',
    # r18 (r17 ADVICE): SQL doubled-quote escape inside quoted strings
    '"quick""dog"', '"a"""', '"""quick"', '""""', '"qui""', '"fox"" dog"',
    '"quick"" brown" OR cat', '^"the""quick"', 'NEAR("quick""dog" cat, 9)',
]


def sqlite_eval(queries):
    con = sqlite3.connect(":memory:")
    con.execute("CREATE VIRTUAL TABLE t USING fts5(content, tokenize='unicode61')")
    for txt in CORPUS:
        con.execute("INSERT INTO t VALUES (?)", (txt,))
    out = []
    for q in queries:
        try:
            rows = sorted(r[0] for r in con.execute(
                "SELECT rowid FROM t WHERE t MATCH ?", (q,)).fetchall())
            out.append({"q": q, "ok": True, "rows": rows})
        except sqlite3.OperationalError as e:
            out.append({"q": q, "ok": False, "err": str(e)})
    return out


def main(n_random=200):
    rng = random.Random(17)
    queries = EDGE + [gen_expr(rng) for _ in range(n_random)]
    # drop queries with characters the two tokenizers class differently
    queries = [q for q in queries if q.strip() != ""]
    ref = sqlite_eval(queries)

    with tempfile.TemporaryDirectory() as d:
        qpath, opath = os.path.join(d, "q.txt"), os.path.join(d, "out.jsonl")
        with open(qpath, "w", encoding="utf-8") as f:
            f.write("\n".join(queries))
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.FtsDiff {qpath} {opath}"],
            check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        mine = [json.loads(l) for l in open(opath, encoding="utf-8")]

    assert len(mine) == len(ref), (len(mine), len(ref))
    bad = 0
    for m, r in zip(mine, ref):
        assert m["q"] == r["q"]
        if m["ok"] != r["ok"]:
            bad += 1
            print(f"DIVERGE ok-ness {m['q']!r}: mine={m} fts5={r}")
        elif m["ok"] and sorted(m["rows"]) != r["rows"]:
            bad += 1
            print(f"DIVERGE rows {m['q']!r}: mine={sorted(m['rows'])} fts5={r['rows']}")
    n_err = sum(1 for r in ref if not r["ok"])
    print(f"== {len(ref) - bad}/{len(ref)} queries agree with real FTS5 "
          f"({n_err} error cases) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 200))
