"""Source connectors: batch parquet tables, file/Kafka streams, fixtures."""
