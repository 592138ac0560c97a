from apollo_spark.cli import main

raise SystemExit(main())
