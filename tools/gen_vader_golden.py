#!/usr/bin/env python3
# Regenerates src/test/resources/vader_golden_sf0.01.json: the reference-
# replica outputs for the three VADER-valued queries that have no DuckDB
# oracle (q_sentiment, q_sentiment_agg, q_displayed_avg), computed at
# sf0.01 by the committed Python replicas (tools/vader_ref.py for the
# compound, tools/pii_ref.py for the displayed-filter risk) over the SAME
# documents-derived transcript table the engine reads. VaderGoldenSpec
# asserts the engine reproduces this file exactly — giving the VADER
# outputs a reference-anchored check as strong as the oracle rows.
#
# Rerun whenever the lexicon resource or either replica changes:
#   python3 tools/gen_vader_golden.py
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import vader_ref
import pii_ref

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
REDACTION = ("This comment has been reddacted to preserve online privacy"
             " - see r/reddacted for more info")

INJECT = {
    0: lambda i: f" reach me at user{i}@example.com",
    1: lambda i: " Dr. John Smith will see you",
    2: lambda i: " my ssn is 123-45-6789",
    3: lambda i: " call me at (212) 555-1234",
    4: lambda i: " I live at 123 Main St today",
    5: lambda i: " <b>bold</b>  &amp;#x200B;  spaced   out",
    6: lambda i: " " + REDACTION,
    7: lambda i: " contact me: Mrs. Anna Lee Smith",
}

sia = vader_ref.SIA()
tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pydict()

rows = []
for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
    conv_id = f"c{doc_id % 40}"
    turn_idx = int(doc_id // 40)
    t = text + INJECT.get(int(doc_id % 11), lambda i: "")(doc_id)
    # clean chain (pipeline/Clean.scala semantics, from the reference):
    scrape = " ".join(t.split()).replace("&amp;#x200B;", "")
    if scrape == "":
        continue  # F1
    clean = re.sub(r"<.*?>", "", scrape)
    skipped = REDACTION in clean
    if skipped:
        score, risk = 0.0, 0.0
    else:
        score = sia.polarity_scores(clean)["compound"]
        risk = pii_ref.risk_score(pii_ref.analyze_text(clean))
    label = "neutral" if score == 0.0 else ("happy" if score > 0.0 else "sad")
    rows.append((conv_id, turn_idx, skipped, score, label, risk))

q_sentiment = sorted([c, i, s, l] for c, i, _, s, l, _ in rows)
processed = [s for _, _, sk, s, _, _ in rows if not sk]
overall = round(sum(processed) / len(processed), 4)  # python round = banker's, like bround
overall_label = ("neutral" if overall == 0.0
                 else ("happy" if overall > 0.0 else "sad"))
displayed = [s for _, _, sk, s, _, r in rows if not sk and r > 0.0]
disp_avg = round(sum(displayed) / len(displayed), 4)

golden = {
    "q_sentiment": q_sentiment,
    "q_sentiment_agg": {"overall_sentiment": overall,
                        "overall_label": overall_label},
    "q_displayed_avg": {"displayed_avg_sentiment": disp_avg,
                        "displayed_turns": len(displayed)},
}
out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "src", "test", "resources", "vader_golden_sf0.01.json")
with open(out, "w") as f:
    json.dump(golden, f, indent=1)
print(f"wrote {len(q_sentiment)} q_sentiment rows, agg={overall} ({overall_label}), "
      f"displayed_avg={disp_avg} over {len(displayed)} to {out}")
