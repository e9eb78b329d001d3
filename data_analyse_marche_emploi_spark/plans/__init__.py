"""Domain pipelines composing the operator catalog the way the
reference's Logstash pipelines and ingestion program did."""
