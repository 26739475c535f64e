from flex_tpu.cli import main

raise SystemExit(main())
