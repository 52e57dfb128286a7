"""Graded operator implementations (SURVEY.md §2).

Each module registers its queries with
:mod:`pulsar_message_filter_spark.registry` via the ``@graded`` decorator;
``__spark_entry__`` exposes the union to the driver.
"""
