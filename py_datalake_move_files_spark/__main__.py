from py_datalake_move_files_spark.cli import main

raise SystemExit(main())
