"""PiEstimation — flink-examples-batch misc/PiEstimation.java, with the
engine's deterministic counter-hash sampling (reproducible on any cluster).

Run: python examples/pi_estimation.py
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.pipeline_ext import pi_estimation
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    pi_estimation(get_spark(app_name="pi-estimation"), "").show()
