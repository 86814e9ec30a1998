# Gnuplot script: heat-map of |u| from final_state.dat (columns x, y, |u|),
# kept format-compatible with the reference's final_state.plt for users who
# prefer gnuplot over `python -m lbm_tpu.utils.viz`.
set terminal pngcairo size 800,800
set output "final_state.png"
set view map
set size square
set palette rgbformulae 33,13,10
set xlabel "x"
set ylabel "y"
plot "final_state.dat" using 1:2:5 with image title "|u|"
