"""Anomaly detection — the reference's example app re-expressed Spark-first.

Reference: /root/reference/examples/ksml/examples/anomaly_detection.clj:29-43
— [:stream "UserClicks"] -> map to (user, 1) -> group-by-key -> windowed
count (1 minute tumbling) -> filter count >= threshold -> to-stream. Here the
same shape runs over the events testdata: users with anomalously many events
inside one hour window.

Run:  python examples/anomaly_detection.py [sf_dir] [threshold]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksml_spark import get_spark, pipe  # noqa: E402
from ksml_spark.sources.files import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="ksml-anomaly-detection")
    events = load_table(spark, sf_dir, "events")
    anomalies = pipe(
        ["stream", events, {"key": "user_id", "time": "ts"}],
        ["group-by-key"],
        ["windowed-by", ["time-window", 3600000]],
        ["count"],
        ["to-stream"],
        ["where", f"count >= {threshold}"],
        ["select", {"user_id": "user_id", "window_start": "window_start",
                    "count": "count"}],
        spark=spark,
    )
    anomalies.df.orderBy("count", ascending=False).show(20)


if __name__ == "__main__":
    main()
