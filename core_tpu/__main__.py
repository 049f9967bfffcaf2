from core_tpu.cli import main

raise SystemExit(main())
