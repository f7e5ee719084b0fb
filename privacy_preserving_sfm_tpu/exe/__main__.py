from privacy_preserving_sfm_tpu.exe.ppsfm import main

main()
