from docling_translate_ray.cli import main

raise SystemExit(main())
