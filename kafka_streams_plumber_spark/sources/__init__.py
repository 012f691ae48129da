"""Sources and sinks: Kafka (streaming), files (batch), wire serdes,
and the Avro .avsc schema bridge."""
