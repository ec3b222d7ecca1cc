#!/usr/bin/env python3
# Regenerates src/test/resources/pii_differential.jsonl: 5000 random
# texts scored by the committed replica (tools/pii_ref.py).
#
# The generator mixes every behavior class: each PII type in several
# formats, context-keyword boosts, all four false-positive triggers
# (including the bare-digit-run gate that suppresses most digit matches),
# honorific names across casings, zwsp artifacts, and plain chat text.
# Deterministic: fixed seed. Run from the repo root:
#   python3 tools/gen_pii_differential.py
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pii_ref

rng = random.Random(20260817)

filler = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
          "query", "drop", "table", "merge", "branch", "deploy", "rollback",
          "weird", "ok", "sounds", "good", "thanks", "please", "review"]

first = ["John", "Jane", "Alice", "Bob", "Carol", "david", "EMMA", "frank"]
last = ["Smith", "Jones", "Brown", "taylor", "WILSON", "Lee", "Kim"]
honor = ["Mr.", "Mrs.", "Ms.", "Dr.", "mr.", "DR."]
streets = ["Main", "Oak", "Elm", "Park", "Lake", "Hill"]
stypes = ["Street", "St", "Avenue", "Ave", "Road", "Rd", "Boulevard",
          "Blvd", "Lane", "Ln", "Drive", "Dr", "drive", "st."]
domains = ["example.com", "mail.org", "test.io", "corp.net", "x.co"]
keywords = pii_ref.CONTEXT_KEYWORDS
fp_units = ["llm", "ai", "gpu", "cpu", "ram", "mb", "gb", "ghz", "mhz",
            "api", "times", "years", "days", "hours", "minutes", "seconds"]


def email():
    u = "".join(rng.choice("abcdefghij._%+-") for _ in range(rng.randint(3, 8)))
    return f"{u}@{rng.choice(domains)}"


def phone():
    a, b, c = rng.randint(100, 999), rng.randint(100, 999), rng.randint(1000, 9999)
    style = rng.randrange(5)
    if style == 0:
        return f"({a}) {b}-{c}"
    if style == 1:
        return f"{a}-{b}-{c}"
    if style == 2:
        return f"+{rng.randint(1, 99)} {a} {b} {c}"
    if style == 3:
        return f"{a}.{b}.{c}"
    return f"{a}{b}{c}"


def ssn():
    return f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"


def cc():
    sep = rng.choice(["-", " ", ""])
    return sep.join(str(rng.randint(1000, 9999)) for _ in range(4))


def address():
    n = rng.randint(10, 99999)
    words = " ".join(rng.choice(streets) for _ in range(rng.randint(1, 2)))
    return f"{n} {words} {rng.choice(stypes)}"


def name():
    parts = [rng.choice(first)] + [rng.choice(last)
                                   for _ in range(rng.randint(1, 3))]
    return f"{rng.choice(honor)} {' '.join(parts)}"


def fp_trigger():
    style = rng.randrange(4)
    if style == 0:
        return f"{rng.randint(1, 999)} {rng.choice(fp_units)}"
    if style == 1:
        return f"{rng.randint(1, 99)}{rng.choice(['st', 'nd', 'rd', 'th'])}"
    if style == 2:
        return f"{rng.randint(1, 9999)}{rng.choice(['', 'k', 'm', 'b', 'kb', 'mb'])}"
    return str(rng.randint(0, 10 ** rng.randint(1, 9)))


pii_gens = [email, phone, ssn, cc, address, name]


def make_text():
    toks = []
    for _ in range(rng.randint(0, 10)):
        toks.append(rng.choice(filler))
    for _ in range(rng.randint(0, 3)):
        toks.insert(rng.randrange(len(toks) + 1), rng.choice(pii_gens)())
    if rng.random() < 0.35:
        toks.insert(rng.randrange(len(toks) + 1), rng.choice(keywords))
    if rng.random() < 0.30:
        toks.insert(rng.randrange(len(toks) + 1), fp_trigger())
    if rng.random() < 0.05:
        toks.insert(rng.randrange(len(toks) + 1), "&amp;#x200B;")
    if rng.random() < 0.03:
        toks.insert(rng.randrange(len(toks) + 1), "@@")
    return " ".join(toks)


def fmt_conf(c):
    s = f"{c:.9f}".rstrip("0").rstrip(".")
    return s if s else "0"


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "src", "test", "resources", "pii_differential.jsonl")
    with open(out, "w") as f:
        for _ in range(5000):
            t = make_text()
            ms = pii_ref.analyze_text(t)
            f.write(json.dumps({
                "text": t,
                "risk": round(pii_ref.risk_score(ms), 12),
                "matches": [f"{ty}|{v}|{fmt_conf(c)}" for ty, v, c in ms],
            }) + "\n")
    print(f"wrote 5000 cases to {out}")


if __name__ == "__main__":
    main()
