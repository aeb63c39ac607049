from video_annotator_tpu.cli import main
import sys

sys.exit(main())
