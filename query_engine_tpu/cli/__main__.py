from query_engine_tpu.cli.main import main

raise SystemExit(main())
