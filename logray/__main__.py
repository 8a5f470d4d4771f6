from logray.cli import main

raise SystemExit(main())
