@echo off
rem Launch TensorBoard on the training event directory (Windows).
rem
rem Analog of the reference's run_tensorboard_windows.bat (which ships
rem empty — this one works) and of scripts/tensorboard.sh. Takes the log
rem directory (or an environment.json whose tfevent_path points at it)
rem and an optional port.
rem
rem Usage: tensorboard.bat [logdir^|environment.json] [port]

setlocal

set "ARG=%~1"
set "PORT=%~2"
if "%PORT%"=="" set "PORT=6006"

if "%ARG%"=="" (
    set "ENVFILE=%~dp0..\ldm3d_tpu\configs\presets\environment.json"
    for /f "usebackq delims=" %%L in (`python -c "import json,sys;print(json.load(open(sys.argv[1]))['tfevent_path'])" "%ENVFILE%"`) do set "LOGDIR=%%L"
) else if exist "%ARG%\" (
    set "LOGDIR=%ARG%"
) else if exist "%ARG%" (
    for /f "usebackq delims=" %%L in (`python -c "import json,sys;print(json.load(open(sys.argv[1]))['tfevent_path'])" "%ARG%"`) do set "LOGDIR=%%L"
) else (
    set "LOGDIR=%ARG%"
)

echo tensorboard --logdir %LOGDIR% --port %PORT%
python -m tensorboard.main --logdir "%LOGDIR%" --port %PORT% --bind_all

endlocal
