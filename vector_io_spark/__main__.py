from vector_io_spark.cli import main

raise SystemExit(main())
