from json_time_series_extractor_spark.cli import main

main()
