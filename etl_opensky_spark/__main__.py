from etl_opensky_spark.cli import main

raise SystemExit(main())
