# Render the .dat files produced by dy4tpu.utils.logging.log_vector /
# log_psd (same "x y" per-line format as the reference's logVector,
# src/logfunc.cpp:23-43 + data/example.gnuplot conventions).
#
#   python - <<PY
#   from dy4tpu.utils import logging as dlog
#   from dy4tpu.utils import gen
#   x = gen.generate_sin(48e3, 1000, 4096)
#   dlog.log_vector("time", None, x[:512], directory="data")
#   dlog.log_psd("psd", x, 48e3, directory="data")
#   PY
#   gnuplot examples/psd.gnuplot

set terminal pngcairo size 1024,768
set output "data/dy4tpu_demo.png"
set multiplot layout 2,1

set title "time domain"
set xlabel "sample"
set ylabel "amplitude"
set grid
plot "data/time.dat" using 1:2 with lines notitle

set title "power spectral density"
set xlabel "frequency (kHz)"
set ylabel "dB/Hz"
set grid
plot "data/psd.dat" using 1:2 with lines notitle

unset multiplot
