# One-command Docker setup from Windows: build the image, create the
# network/volumes, and start a container in the requested mode.
#
# PowerShell counterpart of deploy/docker/setup_docker.sh — the TPU-native
# analog of the reference's mlops/docker/setup_docker.ps1 (build image, named
# network, persistent volumes, per-mode port mapping, quick-command summary).
# GPU passthrough (`--gpus all`) becomes TPU VM device passthrough
# (`--privileged -v /dev:/dev`); off a TPU VM JAX falls back to CPU, so the
# same command works on a Windows workstation driving a remote daemon.
#
# Usage: .\setup_docker.ps1 [-Environment dev|prod] [-Mode api|train|train-autoencoder|train-diffusion|inference|jupyter]
param(
    [Parameter(Mandatory = $false)]
    [ValidateSet("dev", "prod")]
    [string]$Environment = "dev",

    [Parameter(Mandatory = $false)]
    [ValidateSet("api", "train", "train-autoencoder", "train-diffusion", "inference", "jupyter")]
    [string]$Mode = "api",

    [Parameter(Mandatory = $false)]
    [int]$ApiPort = 8000,

    [Parameter(Mandatory = $false)]
    [int]$JupyterPort = 8888
)

$ErrorActionPreference = "Stop"

try {
    docker --version | Out-Null
    docker info 2>$null | Out-Null
    if ($LASTEXITCODE -ne 0) { throw "daemon" }
} catch {
    Write-Error "Docker is not installed or the daemon is not running."
    exit 1
}

if ($Mode -eq "jupyter" -and $Environment -eq "prod") {
    Write-Error "jupyter is a dev-image mode (the production image doesn't ship it): .\setup_docker.ps1 dev jupyter"
    exit 1
}

$RepoRoot = (Resolve-Path (Join-Path $PSScriptRoot "..\..")).Path
$ImageTag = "ldm3d-tpu:$Environment"
$Network = "ldm3d-network"
$Container = "ldm3d-$Mode"

Write-Host "building $ImageTag ..." -ForegroundColor Cyan
$Target = if ($Environment -eq "prod") { "production" } else { "development" }
docker build --target $Target -t $ImageTag -f (Join-Path $RepoRoot "deploy\docker\Dockerfile") $RepoRoot
if ($LASTEXITCODE -ne 0) { Write-Error "docker build failed"; exit 1 }

docker network inspect $Network 2>$null | Out-Null
if ($LASTEXITCODE -ne 0) { docker network create $Network | Out-Null }

foreach ($v in @("ldm3d-models", "ldm3d-data", "ldm3d-outputs", "ldm3d-logs")) {
    docker volume inspect $v 2>$null | Out-Null
    if ($LASTEXITCODE -ne 0) { docker volume create $v | Out-Null }
}

$RunArgs = @(
    "run", "-d", "--name", $Container, "--network", $Network,
    "-v", "ldm3d-models:/app/checkpoints",
    "-v", "ldm3d-data:/app/dataset",
    "-v", "ldm3d-outputs:/app/results",
    "-v", "ldm3d-logs:/app/runs"
)

# TPU passthrough for compute modes; JAX_PLATFORMS= (empty) overrides the
# image's tpu pin -> auto-detect, so the command is a CPU-fallback no-op off
# a TPU VM
$JaxPlatforms = if ($env:JAX_PLATFORMS) { $env:JAX_PLATFORMS } else { "" }
switch ($Mode) {
    { $_ -in @("train", "train-autoencoder", "train-diffusion", "inference") } {
        $RunArgs += @("--privileged", "-v", "/dev:/dev", "-e", "JAX_PLATFORMS=$JaxPlatforms")
    }
    "api" {
        $RunArgs += @("--privileged", "-v", "/dev:/dev",
                      "-p", "${ApiPort}:8000", "-e", "JAX_PLATFORMS=$JaxPlatforms")
    }
    "jupyter" {
        $RunArgs += @("-p", "${JupyterPort}:8888")
    }
}

$Existing = docker ps -a --filter "name=^${Container}$" --format "{{.Names}}"
if ($Existing) {
    Write-Host "replacing existing container $Container" -ForegroundColor Yellow
    docker stop $Container 2>$null | Out-Null
    docker rm $Container | Out-Null
}

$RunArgs += @($ImageTag, $Mode)
& docker @RunArgs
if ($LASTEXITCODE -ne 0) { Write-Error "failed to start container"; exit 1 }

Start-Sleep -Seconds 2
docker ps --filter "name=$Container" --format "table {{.Names}}`t{{.Status}}`t{{.Ports}}"

Write-Host "`nquick commands:" -ForegroundColor Cyan
Write-Host "  logs:   docker logs -f $Container"
Write-Host "  stop:   docker stop $Container"
Write-Host "  remove: docker rm $Container"
if ($Mode -eq "api") {
    Write-Host "`napi endpoints (port $ApiPort):" -ForegroundColor Cyan
    Write-Host "  GET  /health     GET /metrics     GET /model/info"
    Write-Host "  POST /generate   POST /model/reload"
}
if ($Mode -eq "jupyter") {
    Write-Host "`njupyter: http://localhost:$JupyterPort (token: docker logs $Container | Select-String token=)" -ForegroundColor Cyan
}
