"""monocator_spark — PySpark-native rebuild of the monocator crawl engine."""
