from slacken_spark.cli import main

raise SystemExit(main())
