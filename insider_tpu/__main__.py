from insider_tpu.cli import main

main()
