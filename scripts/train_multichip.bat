@echo off
REM Multi-chip training launcher (Windows) — parity with the reference's
REM train_autoencoder_multigpu.bat. There is no torchrun: one process drives
REM every visible chip through the jitted, mesh-sharded train step.
REM Usage: train_multichip.bat [N_DEVICES] [extra flags...]
REM (NOTE: %* is NOT affected by shift in cmd, so extra flags are collected
REM  into EXTRA explicitly.)

setlocal enabledelayedexpansion
set NDEV=%1
if "%NDEV%"=="" set NDEV=0
shift

set EXTRA=
:collect
if "%~1"=="" goto collected
set EXTRA=!EXTRA! %1
shift
goto collect
:collected

set CONFIG=%LDM_CONFIG_FILE%
if "%CONFIG%"=="" set CONFIG=ldm3d_tpu\configs\presets\config_train_32g.json
set ENVFILE=%LDM_ENVIRONMENT_FILE%
if "%ENVFILE%"=="" set ENVFILE=ldm3d_tpu\configs\presets\environment.json

echo [stage 1] autoencoder on %NDEV% devices (0 = all visible)
python -m ldm3d_tpu.cli.train_autoencoder -c %CONFIG% -e %ENVFILE% -g %NDEV% --amp !EXTRA!
if errorlevel 1 exit /b %errorlevel%

echo [stage 2] diffusion on %NDEV% devices
python -m ldm3d_tpu.cli.train_diffusion -c %CONFIG% -e %ENVFILE% -g %NDEV% --amp !EXTRA!
endlocal
