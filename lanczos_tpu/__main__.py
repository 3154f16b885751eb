from lanczos_tpu.cli import main

raise SystemExit(main())
