"""Pure-Python extraction core (no Spark imports).

Reproduces the sample-extraction semantics of the reference library
(``/root/reference/src/JsonTimeSeriesExtractor/TimeSeriesExtractor.cs``).
The Spark operators in ``..operators.extract`` run this core inside
Arrow-batched ``mapInPandas`` workers.
"""
