"""CEP PatternSelectFunction — flink-cep PatternStream.select parity
(PatternStream.java:98): the user function receives the matched events per
stage (the reference's Map<String, List<IN>>) and emits the output row
directly — derived columns computed inside the same worker pass that
scanned the key, no join-back. ``flat_select`` (PatternStream.java:305)
adds the zero-output-drop / fan-out contract.

Run: python examples/cep_select_function.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.graph import cep_select_function
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cep_select_function(get_spark(app_name="cep-select"), sf_dir).show(10)
