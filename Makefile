# Live-Kafka proof rig (SURVEY.md §7 ADR-1, VERDICT r12 #6): the
# frozen parquet contract fixtures are the CI boundary; this target is
# the one-command way to ALSO prove the real-broker path outside the
# sandbox. It starts a single KRaft broker (deployment/kafka/), runs
# tests/test_kafka_live.py with the spark-sql-kafka connector pulled
# onto the session classpath (requires network for the first --packages
# resolution), and tears the broker down. Reference: Makefile.iidr:93-98.

PYSPARK_VERSION ?= $(shell python3 -c "import pyspark; print(pyspark.__version__)")
KAFKA_PACKAGE    = org.apache.spark:spark-sql-kafka-0-10_2.13:$(PYSPARK_VERSION)
COMPOSE          = docker compose -f deployment/kafka/docker-compose.yaml

.PHONY: kafka-up kafka-down kafka-live-test test bench

kafka-up:
	$(COMPOSE) up -d --wait

kafka-down:
	$(COMPOSE) down -v

kafka-live-test: kafka-up
	KAFKA_BOOTSTRAP_SERVERS=localhost:9092 \
	PYSPARK_SUBMIT_ARGS="--packages $(KAFKA_PACKAGE) pyspark-shell" \
	python3 -m pytest tests/test_kafka_live.py -v; \
	status=$$?; $(COMPOSE) down -v; exit $$status

test:
	python3 -m pytest tests/ -x -q

bench:
	python3 bench.py
