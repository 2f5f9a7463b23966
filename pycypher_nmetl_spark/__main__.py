from pycypher_nmetl_spark.cli import main

raise SystemExit(main())
