#!/usr/bin/env python
"""Regenerate tests/goldens/real_seeds.json from the reference seed
corpus. Run from the repo root; review the diff before committing."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from extract_ocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".."))
    from test_real_seed_goldens import GOLDEN, extract_goldens

    spark = get_spark("local[8]", app_name="gen-goldens",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    result = extract_goldens(spark)
    with open(GOLDEN, "w") as f:
        json.dump(dict(sorted(result.items())), f, indent=1)
        f.write("\n")
    print(f"wrote {len(result)} goldens to {GOLDEN}")
    spark.stop()


if __name__ == "__main__":
    main()
