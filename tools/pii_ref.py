#!/usr/bin/env python3
# Python replica of the reference PII detector's analyze_text
# (reddacted/pii_detector.py:24-127) — used ONLY to generate the
# committed differential corpus (src/test/resources/pii_differential.jsonl).
#
# Provenance: the patterns, weights, keywords, gate, and control flow are
# transcribed from the reference source (regex constants character-for-
# character); this replica runs them through Python `re` exactly as the
# reference does (re.IGNORECASE, finditer, dict insertion order), so the
# corpus captures genuine CPython regex semantics rather than a Scala
# self-comparison.
import re

# (type, pattern, base_confidence) in reference dict insertion order
PATTERNS = [
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b", 0.95),
    ("phone", r"\b(\+\d{1,2}\s?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}\b", 0.85),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", 0.97),
    ("credit_card", r"\b(?:\d{4}[- ]?){3}\d{4}\b", 0.95),
    ("address",
     r"\b\d{2,5}\s+(?:[A-Za-z]+\s)+(?:street|st|avenue|ave|road|rd|boulevard|blvd|lane|ln|drive|dr)\.?\b",
     0.65),
    ("name_pattern",
     r"\b(?:Mr\.|Mrs\.|Ms\.|Dr\.)\s+[A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,2}\b", 0.7),
]

TYPE_WEIGHTS = {"ssn": 1.2, "credit_card": 1.2, "email": 1.0,
                "phone": 0.9, "address": 0.7, "name_pattern": 0.6}

CONTEXT_KEYWORDS = ["name is", "live at", "address", "reach me", "phone",
                    "email", "contact", "call me", "ssn", "social security",
                    "credit card", "driver license"]

FALSE_POSITIVE_PATTERNS = [
    r"\b\d+ (llm|ai|gpu|cpu|ram|mb|gb|ghz|mhz|api)\b",
    r"\b\d+ (times|years|days|hours|minutes|seconds)\b",
    r"\b\d+(?:st|nd|rd|th)\b",
    r"\b\d+[km]?b?\b",
]

CONTEXT_BOOST = 0.15

_compiled = [(t, re.compile(p, re.IGNORECASE), c) for t, p, c in PATTERNS]
_fp = [re.compile(p, re.IGNORECASE) for p in FALSE_POSITIVE_PATTERNS]
_ctx = [re.compile(r"\b" + k + r"\b", re.IGNORECASE) for k in CONTEXT_KEYWORDS]


def analyze_text(text):
    """Returns [(type, value, confidence)] — the reference's match list."""
    if any(p.search(text) for p in _fp):
        return []
    out = []
    for t, p, conf in _compiled:
        for m in p.finditer(text):
            full = m.group(0)
            if t == "phone":
                if len(full.replace("-", "").replace(" ", "")) < 10:
                    continue
            elif t == "address":
                toks = [x for x in full.split() if x]
                if not (len(toks) >= 2 and any(ch.isalpha() for ch in toks[-2])):
                    continue
            out.append((t, full, conf))
    if not out:
        return []
    boost = CONTEXT_BOOST if any(p.search(text) for p in _ctx) else 0.0
    return [(t, v, min(1.0, c + boost)) for t, v, c in out]


def risk_score(matches):
    if not matches:
        return 0.0
    tw = sum(TYPE_WEIGHTS.get(t, 1.0) for t, _, _ in matches)
    ws = sum(c * TYPE_WEIGHTS.get(t, 1.0) for t, _, c in matches)
    return min(1.0, ws / tw)
