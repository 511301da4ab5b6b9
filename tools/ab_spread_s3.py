"""Session-3 interleaved A/B: io.spread on the three explode-heavy
document-scan ops (text_char_entropy, text_hashed_ngram_features,
dedup_span_ngram).

Variant A = spread patched to identity (the pre-edit shape), variant
B = the real io.spread.  Runs A,B,A,B,A,B per op in ONE session
(cross-process probes showed 2-3x host swings in session 2 — same-
session interleaving is the only comparison this host supports),
noop sink, min-of-3 per variant.  Also writes the before/after
formatted plans.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shared_solar_data_warehouse_spark.plans import explain_formatted
from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
from shared_solar_data_warehouse_spark.session import get_session
import shared_solar_data_warehouse_spark.operators.text as text_mod
import shared_solar_data_warehouse_spark.operators.dedup as dedup_mod

SF = "/root/testdata/sf0.1"
OPS = {
    "text_char_entropy": text_mod,
    "text_hashed_ngram_features": text_mod,
    "dedup_span_ngram": dedup_mod,
}


def main() -> int:
    load_all_ops()
    spark = get_session("sswh-ab-spread-s3")
    real_spread = {m: m.spread for m in set(OPS.values())}
    identity = lambda spark, df: df  # noqa: E731

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r11")

    def run(name: str) -> float:
        df = REGISTRY[name].builder(spark, SF)
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # ADVICE r11: restore the real spread symbols in a finally so an
    # exception mid-loop cannot leave an operator module monkeypatched
    # with the identity for the rest of the process.
    try:
        for name, mod in OPS.items():
            # warm both variants once (codegen/JIT), then 3 interleaved
            # pairs
            mod.spread = identity
            run(name)
            with open(
                os.path.join(plans_dir, f"{name}_before.txt"), "w"
            ) as fh:
                fh.write(explain_formatted(REGISTRY[name].builder(spark, SF)))
            mod.spread = real_spread[mod]
            run(name)
            with open(
                os.path.join(plans_dir, f"{name}_after.txt"), "w"
            ) as fh:
                fh.write(explain_formatted(REGISTRY[name].builder(spark, SF)))
            a, b = [], []
            for _ in range(3):
                mod.spread = identity
                a.append(run(name))
                mod.spread = real_spread[mod]
                b.append(run(name))
            print(
                f"{name}: plain(min-of-3)={min(a):.3f} {sorted(a)} | "
                f"spread={min(b):.3f} {sorted(b)}",
                flush=True,
            )
    finally:
        for mod, fn in real_spread.items():
            mod.spread = fn
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
