"""Annotator throughput at synthetic scale (A11 timex, A12 NER).

Generates the seed-pinned synthetic transcript table (same generator as
the bench/scaling runs), appends the gate fixture's date/entity surface
forms to EVERY turn (so the regex paths pay both scan and extraction
cost), and measures per-annotator wall + turns/s.

Usage: python tools/annotate_scale_demo.py [n_turns]   (default 800000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsleak_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    from newsleak_spark import annotate
    from newsleak_spark.transcripts import synth_transcripts

    spark = get_spark(app_name="annotate_scale_demo")
    spark.range(1000).count()  # warm-up

    t = synth_transcripts(spark, n_turns)
    t.createOrReplaceTempView("transcripts")
    fixture = annotate.fixture_sql("spark").replace("WHERE doc_id < 400", "")
    fix = spark.sql(fixture)

    out: dict = {"n_turns": n_turns}

    t0 = time.time()
    n_tags = annotate.tag_timex(fix).count()
    w = time.time() - t0
    out["a11"] = {"sec": round(w, 2), "turns_per_sec": round(n_turns / w), "tags": n_tags}

    t0 = time.time()
    ents = annotate.entity_frequencies(fix).collect()
    w = time.time() - t0
    out["a12"] = {
        "sec": round(w, 2),
        "turns_per_sec": round(n_turns / w),
        "distinct_entities": len(ents),
        "mentions": int(sum(r.frequency for r in ents)),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
