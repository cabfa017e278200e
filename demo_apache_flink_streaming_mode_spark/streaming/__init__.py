"""Structured Streaming layer: unbounded twins of the batch operators.

The reference is a Flink DataStream demo; its pipelines map here to
``readStream -> (the same DataFrame expressions as the batch layer) ->
writeStream``. Modules:

- ``sources``   — S1 monitored-directory file source, S2 Kafka source
- ``sinks``     — K1 file sink, K2 Kafka sink, K3 console, memory/test
- ``pipelines`` — streaming forms of A2-A6 windows, J1 join, W1/W2
                  watermarks (the reference entry points EP1-EP3)
- ``stateful``  — ST1/ST2 true keyed state via applyInPandasWithState
"""
