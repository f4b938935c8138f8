"""Build the EDGE-CASE fixture: sf0.001 with adversarial documents
appended — empty text, whitespace-only, single token, repeated single
token, unicode/diacritics, very long token, and an all-punctuation doc.

The round-7 ADVICE caught bpe_roundtrip silently diverging from its
oracle on empty docs only because the shipped fixtures contain none;
this fixture makes that whole latent class testable: running
``scripts/check_correctness.py <edge_dir> docs_`` compares every
documents-family entry against its oracle ON the adversarial rows.

Usage: python scripts/make_edge_fixture.py [out_dir]   (default
/tmp/olap_xtrctr_edge_fixture; rebuilt only when missing or stale).
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/olap_xtrctr_edge_fixture"

EDGE_DOCS = [
    # (doc_id offset, text, lang, source)
    (1, "", "en", "src0"),                       # empty
    (2, "   \t  ", "en", "src1"),                # whitespace-only
    (3, "solo", "en", "src0"),                   # single token
    (4, "dup dup dup dup dup dup dup dup", "en", "src2"),
    (5, "café niño straße 中文 emoji",
     "zh", "src1"),                              # unicode + diacritics
    (6, "x" * 5000, "en", "src0"),               # one very long token
    (7, ".,;:!? .,;:!? .,;:!?", "en", "src2"),   # punctuation only
    # planted PII (round 10): the synthetic corpus is PII-free by
    # construction, so the docs_pii_* hit paths are value-checked HERE
    (8, "contact alice.smith+work@example-mail.co or bob@x.io now",
     "en", "src1"),                              # emails
    (9, "server 10.0.0.1 peer 192.168.001.255 id 123456789012 end",
     "en", "src2"),                              # ipv4 + digit-run id
    (10, "user12345678901@host.com embedded digits stay inside",
     "en", "src0"),                              # id-run inside email
]


# Adversarial EVENTS (round 10): timing edges the shipped corpus never
# hits — same-second bursts (curve/sessionize ties), the EXACT 1800 s
# gap boundary (strict > convention: same session) and 1801 s (new
# session), sub-second straddles that only the floor-to-seconds
# convention keeps together, a single-event user, and a 0.0 value.
# Fresh user ids (2001+) so existing users' sessions are untouched.
# NO dyadic half-tie values (e.g. 0.03125): those probe the ENGINES'
# double->DECIMAL rounding modes, not this repo's code.
_B = "2024-02-01 00:00:"
EDGE_EVENTS = [
    # (event_id offset, ts string, user_id, type, value, props)
    (1, _B + "10.000000", 2001, "view", 1.25, '{"k": 1}'),
    (2, _B + "10.000000", 2001, "view", 2.5, '{"k": 2}'),      # same us
    (3, _B + "10.000000", 2001, "purchase", 3.75, '{"k": 3}'),
    (4, "2024-02-01 00:30:10.000000", 2001, "view", 4.0,
     '{"k": 4}'),                       # exactly 1800 s -> same session
    (5, "2024-02-01 01:00:11.000000", 2001, "view", 5.0,
     '{"k": 5}'),                       # 1801 s -> NEW session
    (6, _B + "20.000000", 2002, "purchase", 0.0, '{"k": 6}'),  # lone, 0
    (7, _B + "30.900000", 2003, "view", 12.34567, '{"k": 7}'),
    (8, "2024-02-01 00:30:30.100000", 2003, "view", 7.0,
     '{"k": 8}'),       # 1799.2 s real, 1800 floor-sec -> same session
]


def main() -> None:
    from olap_xtrctr_spark import get_spark

    spark = get_spark("edge-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SRC}/{t}.parquet", dst)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_eid = ev.agg({"event_id": "max"}).first()[0]
    import datetime as _dt
    extra_ev = spark.createDataFrame(
        [(max_eid + off, _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f"),
          uid, typ, val, props)
         for off, ts, uid, typ, val, props in EDGE_EVENTS],
        ev.schema)
    tmp_e = f"{OUT}/_events_tmp"
    ev.unionByName(extra_ev).coalesce(1).write.mode(
        "overwrite").parquet(tmp_e)
    part_e = next(f for f in os.listdir(tmp_e)
                  if f.startswith("part-") and f.endswith(".parquet"))
    target_e = f"{OUT}/events.parquet"
    if os.path.isdir(target_e):
        shutil.rmtree(target_e, ignore_errors=True)
    elif os.path.isfile(target_e):
        os.remove(target_e)
    shutil.move(os.path.join(tmp_e, part_e), target_e)
    shutil.rmtree(tmp_e)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_id = docs.agg({"doc_id": "max"}).first()[0]
    extra = spark.createDataFrame(
        [(max_id + off, text, lang, source,
          len(text)) for off, text, lang, source in EDGE_DOCS],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    tmp = f"{OUT}/_docs_tmp"
    docs.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp)
                if f.startswith("part-") and f.endswith(".parquet"))
    target = f"{OUT}/documents.parquet"
    if os.path.isdir(target) or os.path.isfile(target):
        shutil.rmtree(target, ignore_errors=True)
        if os.path.isfile(target):
            os.remove(target)
    shutil.move(os.path.join(tmp, part), target)
    shutil.rmtree(tmp)
    print(f"edge fixture at {OUT}: {docs.count()} + {len(EDGE_DOCS)} docs")
    spark.stop()


if __name__ == "__main__":
    main()
